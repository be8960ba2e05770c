package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The engine's batch query surface (SURVEY.md §2.14, Q1–Q21).
  *
  * Design rules for DuckDB-oracle exactness (SURVEY §7.6):
  *  - monetary math runs in DECIMAL(18,2) (order-independent, exact) and is
  *    cast to DOUBLE only at the output boundary, so Spark and DuckDB produce
  *    bit-identical doubles regardless of aggregation order / parallelism;
  *  - averages are `CAST(sum_dec AS DOUBLE) / count` — one double division
  *    with identical operands on both engines;
  *  - every query's canonical row order is a unique key set, applied at
  *    the harness tail (SparkEntry.canon — r16: in-operator ORDER BYs cost
  *    a rangepartitioning Exchange whose sampling pass re-executes the
  *    final stage; the answer-sized outputs sort once, in one partition);
  *  - event timestamps travel as epoch-microsecond BIGINTs (see [[Tables]]).
  *
  * Scale notes are inline per query: each plan is shaped so the same code
  * runs on a 1000-executor cluster (broadcast hints for dims, partial
  * aggregation, filter/projection pushdown into the parquet scan).
  */
object CoreQueries {

  /** Cast to exact decimal for order-independent monetary aggregation. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact decimal sum surfaced as a double. */
  private def money(c: Column): Column = sum(dec(c)).cast(DoubleType)

  // --- Q1: filter + projection (both pushed into the parquet scan) -------
  def q01FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderstatus")

  // --- Q2: PII masking via built-in sha2 (codegen'd; no UDF) -------------
  def q02MaskSha256(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "customer")
      .select(col("c_custkey"), sha2(col("c_name"), 256).as("masked"))

  // --- Q3: latest-state materialization (reference §2.5 upsert view) -----
  // row_number over (entity, ts desc) = 1, dropping entities whose final
  // event is the delete marker ('error' plays that role in this corpus).
  // Scale: single shuffle on user_id; state bounded by distinct entities.
  def q03LatestState(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("value").as("last_value"),
        col("ts_us").as("last_ts_us"))
  }

  // --- Q4: delete propagation = latest inserts ANTI JOIN delete markers --
  // Delete marker = an 'error' event in a deterministic 15% id-slice, so the
  // survivor set stays non-trivial at every scale factor (events-per-user is
  // constant across SFs, so "any error at all" would delete everyone).
  def q04DeletePropagation(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val latest = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"))
    val deleted = ev.filter(col("event_type") === "error" &&
        col("event_id") % 100 < 15)
      .select("user_id").distinct()
    latest.join(deleted, Seq("user_id"), "left_anti")
  }

  // --- Q69: SCD Type-2 historization (q03's history-complete dual) -------
  /** Slowly-changing-dimension history — what the warehouse keeps when
    * it does NOT overwrite on upsert: every state change opens a
    * version row with a validity interval, the next change (INCLUDING
    * the delete marker) closes it, and `is_current` marks the open
    * version. q03 materializes only the last rung of this table; a
    * point-in-time query (`valid_from <= t < valid_to`) reads any
    * historical state without replaying the log. A user whose final
    * event is the delete marker ends with NO current row — the delete
    * terminates the history, the same final-event rule q03's latest-
    * state filter applies (q04's slice-marker deletion is a different,
    * any-event contract). Shape:
    * one shuffle on the entity key, one LEAD window — history size is
    * the change count, never entities × time. */
  def q69Scd2History(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.events(s, dir)
      // the closing edge comes from ALL events (a delete closes the
      // last open version), then delete markers drop — they open nothing
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("version_event_id"),
        col("event_type").as("state_type"), col("value").as("state_value"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  // --- Q70: point-in-time temporal join against the SCD2 table -----------
  /** The consumer [[q69Scd2History]] exists for — enrich a fact with the
    * dimension state IN EFFECT when the fact happened (fact × SCD2
    * dimension AS OF fact.ts): each purchase joins the version whose
    * validity interval strictly precedes and covers its timestamp
    * (`valid_from < ts <= valid_to` — the half-open chain makes the
    * match unique; the purchase's OWN version opens at its timestamp
    * and never matches). A purchase right after the delete marker finds
    * no state (the error closed the open version) and a user's first
    * event has no prior — both surface as a null prior, never a wrong
    * one. Shape: equi-join on the entity key with range residuals —
    * per-entity histories are bounded by change counts, so the
    * sort-merge side stays proportional to changes, never entities ×
    * time. */
  def q70PitJoin(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"),
        col("user_id").as("p_user_id"), col("ts_us").as("purchase_ts_us"))
    val h = q69Scd2History(s, dir)
    p.join(h, col("p_user_id") === col("user_id") &&
        col("valid_from_us") < col("purchase_ts_us") &&
        col("purchase_ts_us") <=
          coalesce(col("valid_to_us"), lit(Long.MaxValue)), "left")
      .select(col("purchase_event_id"), col("p_user_id").as("user_id"),
        col("purchase_ts_us"),
        col("version_event_id").as("prior_event_id"),
        col("state_type").as("prior_state_type"),
        col("state_value").as("prior_state_value"))
  }

  // --- Q5: type casting / widening (reference §1.2 type matrix) ----------
  // price_dec is exact-2-decimal, so DOUBLE at the output boundary round-trips
  // exactly; raw DECIMAL columns hash differently in the driver's harness.
  def q05TypeCast(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("bigint").as("qty_big"),
        dec(col("l_extendedprice")).cast("double").as("price_dec"),
        col("l_shipdate").cast("date").as("ship_date"))

  // --- Q6: max-progress aggregation (reference offset tracking §2.4) -----
  def q06MaxProgress(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(max(col("ts_us")).as("max_ts_us"), count(lit(1)).as("n"),
        money(col("value")).as("sum_value"))

  // --- Q7: inner equi-join (shuffle hash/SMJ on the big sides; AQE picks)
  def q07JoinInner(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    val c = Tables.table(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        col("o_totalprice"))
  }

  // --- Q8a: left outer join + aggregate ----------------------------------
  def q08JoinLeft(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(s, dir, "customer")
    val o = Tables.table(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        money(col("o_totalprice")).as("total_spent"))
  }

  // --- Q8b: anti join (customers with no URGENT orders; ~e^-2 of customers
  // at every SF since orders-per-customer is constant) ----------------------
  def q08bJoinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(s, dir, "customer")
    val o = Tables.table(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  // --- Q9: multi-way join, TPC-H Q5 shape ---------------------------------
  // Dims (region/nation/customer-side) broadcast; the lineitem⋈orders
  // fact-fact join shuffles on orderkey — the only unavoidable big shuffle.
  def q09JoinMultiway(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(s, dir, "lineitem")
    val o = Tables.table(s, dir, "orders")
    val c = Tables.table(s, dir, "customer")
    val n = Tables.table(s, dir, "nation")
    val r = Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")
    val rev = dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(rev).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  // --- Q10: broadcast dim join (fact × tiny dims, zero fact shuffle pre-agg)
  def q10JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(s, dir, "lineitem")
    val sup = Tables.table(s, dir, "supplier")
    val n = Tables.table(s, dir, "nation")
    val r = Tables.table(s, dir, "region")
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_lines"),
        money(col("l_extendedprice")).as("total_price"))
  }

  // --- Q11: TPC-H Q1 hash aggregate (partial+final, exact decimal) --------
  def q11AggTpchQ1(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val disc = dec(col("l_discount"))
    val ext = dec(col("l_extendedprice"))
    val tax = dec(col("l_tax"))
    Tables.table(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).as("sum_qty_dec"),
        sum(ext).as("sum_base_dec"),
        sum(ext * (one - disc)).cast(DoubleType).as("sum_disc_price"),
        sum(ext * (one - disc) * (one + tax)).cast(DoubleType).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_dec").cast(DoubleType).as("sum_qty"),
        col("sum_base_dec").cast(DoubleType).as("sum_base_price"),
        col("sum_disc_price"), col("sum_charge"),
        (col("sum_qty_dec").cast(DoubleType) / col("count_order")).as("avg_qty"),
        (col("sum_base_dec").cast(DoubleType) / col("count_order")).as("avg_price"),
        col("count_order"))
  }

  // --- Q12: exact distinct (expands to two-phase agg; no driver collect) --
  def q12CountDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))

  // --- Q12b: approximate distinct (HLL++; rows-only check, no oracle) -----
  // rsd 2% (default 5% is one sigma, not a bound — a single draw exceeded
  // 5% error on a 1.5k-key corpus): ~2^12 registers per group, still a
  // constant-memory sketch with map-side partial merge at any scale, and
  // the OperatorsSpec ≤5% tolerance gate sits 2.5 sigma out.
  /** HLL++ sketch demo as a GATE query (VERDICT r04 ask #7): the sketch
    * estimate is engine-specific, so the driver-checkable output carries
    * the exact recomputable components (row count, exact distinct) plus
    * the tolerance assertion computed HERE from the live sketch — the
    * oracle recomputes the exacts and pins the boolean true. The sketch
    * still runs in full; its value-level error bound is also spec-gated
    * at two scales (OperatorsSpec). */
  def q12bApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
        countDistinct(col("o_custkey")).as("n_cust_exact"),
        count(lit(1)).as("n_orders"))
      .select(col("n_orders"), col("n_cust_exact"),
        (abs(col("approx_cust") - col("n_cust_exact")).cast(DoubleType) /
          col("n_cust_exact") <= 0.05).as("approx_within_5pct"))

  // --- Q13: ROLLUP with GROUPING() disambiguation -------------------------
  def q13Rollup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    val c = Tables.table(s, dir, "customer")
    val n = Tables.table(s, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(grouping(col("n_name")).cast("int").as("g_nation"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n_orders"),
        money(col("o_totalprice")).as("total_price"))
      .select(col("n_name"), col("o_orderpriority"), col("g_nation"),
        col("g_prio"), col("n_orders"), col("total_price"))
  }

  // --- Q14: HAVING over scalar subquery (TPC-H Q11 shape) ------------------
  def q14HavingSubquery(s: SparkSession, dir: String): DataFrame = {
    val totals = Tables.table(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(sum(dec(col("c_acctbal"))).as("tb"))
    val avgAll = totals.agg(
      (sum(col("tb")).cast(DoubleType) / count(lit(1))).as("avg_tb"))
    totals.crossJoin(broadcast(avgAll))
      .filter(col("tb").cast(DoubleType) > col("avg_tb"))
      .select(col("c_nationkey"), col("tb").cast(DoubleType).as("total_bal"))
  }

  // --- Q15: ranking window, top-3 per nation -------------------------------
  def q15WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.table(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
  }

  // --- Q16: analytic window (lag + 10-row moving sum, reference §2.4) ------
  def q16WindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(dec(col("o_totalprice")), 1).over(w).cast(DoubleType).as("prev_price"),
        sum(dec(col("o_totalprice"))).over(w.rowsBetween(-9, 0))
          .cast(DoubleType).as("moving_sum_10"))
      .select("o_custkey", "o_orderkey", "prev_price", "moving_sum_10")
  }

  // --- Q17: event-time tumbling window (1h), pure integer bucket math ------
  def q17TimeBucket(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("bucket_us",
        expr("ts_us DIV 3600000000") * lit(3600000000L))
      .groupBy("bucket_us")
      .agg(count(lit(1)).as("n"), money(col("value")).as("sum_value"))

  // --- Q18: top-k (plans as TakeOrderedAndProject — no full sort) ----------
  def q18TopK(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  /** TPC-H Q3 shape (shipping priority): selective filters on both fact
    * sides + a broadcastable dimension filter, join, decimal-exact
    * revenue aggregation, top-10. The classic benchmark pattern for
    * "does the optimizer push filters below the join and take the top-k
    * without a global sort": both date predicates reach the parquet
    * scans, customer broadcasts, and the final 10 rows come from
    * `TakeOrderedAndProject`. */
  def q18bShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val cutoff = "1995-03-15"
    val c = Tables.table(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.table(s, dir, "orders")
      .filter(col("o_orderdate") < lit(cutoff))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.table(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit(cutoff))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  // --- Q19: set operations --------------------------------------------------
  def q19SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(s, dir, "customer")
    val a = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    val b = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val both = a.intersect(b).withColumn("tag", lit("both"))
    val onlyA = a.except(b).withColumn("tag", lit("only_a"))
    both.unionByName(onlyA)
      .select("tag", "c_custkey")
  }

  /** ALL-variant set ops (bag semantics — `intersectAll`/`exceptAll`
    * preserve duplicate multiplicity, which DISTINCT-based q19 cannot):
    * order priorities per clerk-month vs the previous month. Multiplicity
    * matters exactly when the operand is a bag of events, the common case
    * in CDC streams. */
  def q19bSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    val jan = o.filter(month(col("o_orderdate")) === 1)
      .select(col("o_orderpriority"))
    val feb = o.filter(month(col("o_orderdate")) === 2)
      .select(col("o_orderpriority"))
    val common = jan.intersectAll(feb).withColumn("tag", lit("common"))
    val janOnly = jan.exceptAll(feb).withColumn("tag", lit("jan_extra"))
    common.unionByName(janOnly)
      .groupBy("tag", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
  }

  // --- Q20: scalar string/date/math functions -------------------------------
  def q20Scalar(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        substring(col("o_orderpriority"), 1, 1).as("pri1"),
        lower(substring(col("o_orderpriority"), 3, 20)).as("pri_word"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        length(col("o_orderpriority")).as("pri_len"),
        (col("o_orderkey") % 97).as("mod97"))

  // --- Q22: HMAC-SHA256 keyed masking (custom Catalyst expression §2.8) ----
  // No DuckDB oracle: DuckDB 1.0's sha256() is VARCHAR-only, so a raw-byte
  // HMAC cannot be expressed there; parity with javax.crypto is proven in
  // MaskingSpec instead. Rows-only check from the driver.
  /** HMAC-SHA256 masking as a GATE query (VERDICT r04 ask #7): DuckDB has
    * no HMAC, so the driver-checkable output carries recomputable counts
    * (rows, distinct inputs), structural assertions over every live token
    * (64-char lowercase hex, collision-free on this corpus), and a PROBE
    * column — the codegen expression applied to a fixed input, which the
    * oracle pins to an independently-computed RFC 2104 golden literal.
    * Per-row value goldens vs javax.crypto live in MaskingSpec. */
  def q22MaskHmac(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{HmacSha256, MaskRules}
    Tables.table(s, dir, "customer")
      .select(col("c_custkey"),
        HmacSha256.hmac_sha256(col("c_name"),
          lit(MaskRules.DefaultKey)).as("hmac_token"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("hmac_token").rlike("^[0-9a-f]{64}$"), 1L)
          .otherwise(0L)).as("n_wellformed"),
        countDistinct(col("hmac_token")).as("n_distinct_tokens"))
      .withColumn("probe_hmac",
        HmacSha256.hmac_sha256(lit("graft-probe"), lit(MaskRules.DefaultKey)))
  }

  // --- Q40: full-outer join -------------------------------------------------
  // Completes the join family (inner/left/anti/semi/broadcast/as-of/range):
  // BUILDING-segment customers FULL OUTER their finished-order totals.
  // Both filters are deliberately asymmetric so each side contributes
  // unmatched rows — non-BUILDING customers with F orders survive on the
  // right, BUILDING customers without F orders on the left. Same shuffle
  // shape as q08 (one exchange per side on custkey); at scale the
  // pre-aggregated order side is the smaller input, exactly what a
  // full-outer sort-merge wants.
  def q40JoinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val o = Tables.table(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_f_orders"), money(col("o_totalprice")).as("f_total"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_custkey").isNotNull.as("in_building"),
        coalesce(col("n_f_orders"), lit(0L)).as("n_f_orders"),
        coalesce(col("f_total"), lit(0.0)).as("f_total"))
  }

  // --- Q21: array / map / json ----------------------------------------------
  def q21ArrayJson(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(s, dir, "customer")
    val n = Tables.table(s, dir, "nation")
    // cust_keys goes out as a JSON string, not a raw ARRAY: the driver's
    // sort+hash harness cannot hash ndarray cells; to_json preserves the
    // sorted-list semantics and is byte-identical to DuckDB's to_json(list).
    val agg = c.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        to_json(array_sort(collect_list(col("c_custkey")))).as("cust_keys"))
    agg.join(broadcast(n), agg("c_nationkey") === n("n_nationkey"))
      .select(col("c_nationkey"), col("n_cust"),
        col("cust_keys"),
        to_json(struct(col("n_nationkey"), col("n_cust"))).as("j"),
        element_at(map(lit("name"), col("n_name")), "name").as("map_val"))
  }
}
