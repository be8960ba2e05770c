#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: run Verify's
parquet dumps against the DuckDB oracle SQL and diff exactly.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    # lists/arrays -> tuples so equality works
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list,)) or
                              type(v).__name__ == "ndarray" else v)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no output parquet"); failures += 1; continue
        try:
            mine = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if list(mine.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(want.columns)}")
            failures += 1; continue
        if len(mine) != len(want):
            print(f"FAIL {name}: rows {len(mine)} vs {len(want)}"); failures += 1; continue
        if not mine.equals(want):
            # locate first mismatching cell for debugging
            bad = None
            for c in mine.columns:
                a, b = mine[c], want[c]
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = int(neq.idxmax())
                    bad = (c, i, a.iloc[i], b.iloc[i])
                    break
            dt = {c: (str(mine[c].dtype), str(want[c].dtype)) for c in mine.columns
                  if str(mine[c].dtype) != str(want[c].dtype)}
            print(f"FAIL {name}: value mismatch {bad} dtypes_diff={dt}")
            failures += 1; continue
        print(f"OK   {name} ({len(mine)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle-checked queries pass")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
