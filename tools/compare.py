#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: run Verify's
parquet dumps against the DuckDB oracle SQL and diff exactly.

Strictness mirrors the driver's sort+hash harness:
  * Spark output is read via pyarrow/pandas (NOT DuckDB), so representation
    differences (e.g. DECIMAL objects vs float64) fail here exactly as they
    fail in the driver's hash comparison.
  * Rows are lexsorted over all columns with pandas sort_values — raw ARRAY
    columns crash this step (unhashable ndarray), just like the driver.
  * Values are compared via pandas hash with dtype sensitivity; no
    array->tuple or decimal->float canonicalisation is applied.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # The driver is date-representation tolerant (q30 DATE columns passed r01)
    # but decimal/array strict (q05/q21 failed r01): normalise datetimes only.
    for c in df.columns:
        v = df[c]
        first = v.dropna().iloc[0] if v.notna().any() else None
        if str(v.dtype).startswith("datetime64") or \
           type(first).__name__ in ("date", "datetime", "Timestamp"):
            df[c] = pd.to_datetime(v).astype("datetime64[ns]")
    if len(df.columns):
        # driver-style lexsort; intentionally dies on unhashable cells
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def frame_hash(df: pd.DataFrame):
    return [int(pd.util.hash_pandas_object(df[c], index=False).sum())
            for c in df.columns]

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver corpora are single files; ScaleTrend-synthesized ones are
        # Spark part-file directories — accept both
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no output parquet"); failures += 1; continue
        try:
            mine = canon(pd.concat([pd.read_parquet(f) for f in files],
                                   ignore_index=True))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if list(mine.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(want.columns)}")
            failures += 1; continue
        if len(mine) != len(want):
            print(f"FAIL {name}: rows {len(mine)} vs {len(want)}"); failures += 1; continue
        if frame_hash(mine) != frame_hash(want):
            # locate first mismatching cell / dtype for debugging
            bad = None
            for c in mine.columns:
                a, b = mine[c], want[c]
                try:
                    neq = ~((a == b) | (a.isna() & b.isna()))
                    if neq.any():
                        i = int(neq.idxmax())
                        bad = (c, i, repr(a.iloc[i]), repr(b.iloc[i]))
                        break
                except Exception:
                    bad = (c, "?", "uncomparable", "uncomparable")
                    break
            dt = {c: (str(mine[c].dtype), str(want[c].dtype)) for c in mine.columns
                  if str(mine[c].dtype) != str(want[c].dtype)}
            ot = {c: (type(mine[c].iloc[0]).__name__, type(want[c].iloc[0]).__name__)
                  for c in mine.columns if len(mine) and
                  str(mine[c].dtype) == "object" and
                  type(mine[c].iloc[0]) is not type(want[c].iloc[0])}
            print(f"FAIL {name}: hash mismatch first_diff={bad} dtypes_diff={dt} objtypes_diff={ot}")
            failures += 1; continue
        print(f"OK   {name} ({len(mine)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle-checked queries pass")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
