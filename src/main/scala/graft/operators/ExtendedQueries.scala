package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Extended relational surface beyond SURVEY §2.14 — operators a user of a
  * full warehouse expects (cube, pivot, analytic-window family, quantifiers,
  * percentiles, ordered string agg, conditional aggregation, date math) plus
  * an as-of join implemented the scalable merge-sorted way. Exactness
  * conventions as in [[CoreQueries]].
  */
object ExtendedQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def money(c: org.apache.spark.sql.Column) = sum(dec(c)).cast(DoubleType)

  // --- Q23: CUBE ------------------------------------------------------------
  def q23Cube(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    val c = Tables.table(s, dir, "customer")
    val n = Tables.table(s, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name"), col("o_orderstatus"))
      .agg(grouping(col("n_name")).cast("int").as("g_nation"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        count(lit(1)).as("n_orders"),
        money(col("o_totalprice")).as("total_price"))
      .select("n_name", "o_orderstatus", "g_nation", "g_status",
        "n_orders", "total_price")
  }

  // --- Q24: PIVOT (wide conditional aggregation) ----------------------------
  // Explicit value list keeps the plan single-pass (no distinct-scan) and the
  // output schema static — required for both the oracle and scale.
  val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def q24Pivot(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    val c = Tables.table(s, dir, "customer")
    val n = Tables.table(s, dir, "nation")
    val pivoted = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)))
    // pivot yields NULL for a (nation, priority) with zero rows; the
    // oracle's count(*) FILTER yields 0 — coalesce so absent combinations
    // agree on any corpus, not just ones where every cell is populated.
    pivoted.select(col("n_name") +:
        Priorities.map(p => coalesce(col(s"`$p`"), lit(0L)).as(p)): _*)
  }

  // --- Q39: unpivot (melt) — the inverse of q24 -----------------------------
  /** `Dataset.unpivot` melts the per-priority count columns back into
    * (nation, priority, n) rows — the wide→long reshape a reporting layer
    * runs after a pivoted extract. Pure per-row reshaping: the only
    * shuffle is q24's own aggregation; unpivot itself is a narrow
    * `Expand`-style projection at any scale. */
  def q39Unpivot(s: SparkSession, dir: String): DataFrame =
    q24Pivot(s, dir)
      .unpivot(Array(col("n_name")),
        Priorities.map(p => col(s"`$p`")).toArray,
        "o_orderpriority", "n")

  // --- Q25: analytic window family -----------------------------------------
  def q25WindowFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).cast("int").as("drank"),
        ntile(4).over(w).cast("int").as("quartile"),
        lead(dec(col("o_totalprice")), 1).over(w).cast(DoubleType).as("next_price"),
        first(dec(col("o_totalprice"))).over(wFull).cast(DoubleType).as("first_price"),
        last(dec(col("o_totalprice"))).over(wFull).cast(DoubleType).as("last_price"))
  }

  // --- Q54: ordered-set aggregates (mode, discrete median) -------------------
  /** `mode()` and `percentile_disc(0.5)` — the ordered-set aggregate
    * family, constructed EXPLICITLY rather than through the built-ins
    * (whose tie-break rules differ between engines): mode = the value
    * with the highest count, ties to the smallest value; discrete
    * median = the smallest value whose cumulative count reaches half
    * the group (`2·cum ≥ total`, an exact integer comparison — no 0.5
    * float threshold). One (group, value) count aggregation feeds both;
    * the windows run over the tiny distinct-value domain, not the fact.
    */
  def q54ModeMedian(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.table(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), dec(col("l_quantity")).as("q"))
      .groupBy("flag", "q").agg(count(lit(1)).as("cnt"))
    val mode = counts
      .withColumn("rn", row_number().over(Window.partitionBy(col("flag"))
        .orderBy(col("cnt").desc, col("q").asc)))
      .filter(col("rn") === 1)
      .select(col("flag"), col("q").cast(DoubleType).as("mode_qty"),
        col("cnt").as("mode_count"))
    val med = counts
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("flag")).orderBy(col("q"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("flag"))))
      .filter(col("cum") * 2 >= col("tot"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("flag"))
        .orderBy(col("q").asc)))
      .filter(col("rn") === 1)
      .select(col("flag"), col("q").cast(DoubleType).as("median_qty"))
    mode.join(med, "flag")
  }

  // --- Q53: distribution-rank window functions -------------------------------
  /** `percent_rank` / `cume_dist` — the remaining pair of the SQL window
    * family (q25 covers the ordinal/offset functions): per customer,
    * each order's relative standing by price. Both are exact integer
    * ratios surfaced as doubles — (rank−1)/(n−1) and
    * rank_with_ties/n — so the one division per function is the only
    * float op and both engines compute it from identical integers.
    * Single-customer partitions make percent_rank 0/0 → the SQL-standard
    * 0.0 on both engines. Same shuffle as any per-customer window. */
  def q53DistributionRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(dec(col("o_totalprice")).asc, col("o_orderkey").asc)
    Tables.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        dec(col("o_totalprice")).cast(DoubleType).as("price"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  // --- Q26: EXISTS / NOT EXISTS quantifiers (as semi/anti joins) ------------
  def q26ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(s, dir, "customer")
    val o = Tables.table(s, dir, "orders")
    val big = o.filter(col("o_totalprice") > 400000).select("o_custkey")
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .join(open, c("c_custkey") === open("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  // --- Q27: exact percentiles (linear interpolation) ------------------------
  /** Exact type-7 percentiles WITHOUT the built-in `percentile`'s
    * ObjectHashAggregate, which buffers every value per group (~97%
    * distinct here — the per-group buffer IS the dataset, a 100-TB
    * non-starter). Distributed ranking with a TWO-LEVEL prefix sum where
    * the FULL data is never sorted at all: bucket each value into a
    * fixed-width range bucket (deterministic + monotone in v, so
    * correctness never depends on the data distribution — skew only costs
    * balance), aggregate tiny per-(group, bucket) counts (map-side
    * combine: the only full-data shuffle carries groups × buckets rows),
    * turn them into prefix offsets, and — since the offsets table alone
    * pins WHICH buckets contain the ≤6 interpolation-endpoint ranks per
    * group — broadcast-semi-join the raw rows down to just those buckets
    * (~1/#buckets of the data) before the per-bucket ranking sort. A
    * single `partition by group` running sum would pull every row of a
    * group through ONE task's sort (3 groups ⇒ 3 tasks at any scale);
    * here every full-data stage is a scan or a partial aggregation, and
    * the only sort touches the endpoint buckets. The interpolation
    * `lv·(h−pos) + hv·(pos−l)` with pos = q·(n−1) is bit-identical to
    * `percentile()` and the oracle's quantile_cont.
    */
  def q27Percentiles(s: SparkSession, dir: String): DataFrame =
    percentilesOf(Tables.table(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("v")))

  /** [[q27Percentiles]] over an arbitrary (l_returnflag, v) frame — the
    * spec entry point for random/adversarial distributions (all-one-bucket,
    * bucket-boundary ties, negatives, n=1 groups). */
  private[graft] def percentilesOf(raw0: DataFrame): DataFrame = {
    // Bucket width 1000 on a [900, 105000] price domain ⇒ ~105 buckets per
    // group. A shifted domain only changes bucket occupancy, never results.
    val raw = raw0
      .withColumn("b", floor(col("v") / 1000).cast(LongType))
    // Per-(group, bucket) counts are tiny (groups × buckets rows) and
    // aggregate well (map-side combine); the branch is deterministic, so a
    // re-execution cannot diverge from the main branch even without reuse.
    val wOff = Window.partitionBy("l_returnflag").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = raw
      .groupBy(col("l_returnflag"), col("b")).agg(count(lit(1)).as("pt"))
      .withColumn("off", coalesce(sum(col("pt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("pt")).over(Window.partitionBy("l_returnflag")))
    def pos(q: Double) = lit(q) * (col("n") - 1).cast(DoubleType)
    val qs = Seq(0.5, 0.95, 0.99)
    // buckets whose global-rank span [off, off+pt) contains an endpoint —
    // decidable from the tiny counts table alone, before touching the data
    val isEndpointBucket = qs
      .flatMap(q => Seq(floor(pos(q)), ceil(pos(q))))
      .map(r => r >= col("off") && r < col("off") + col("pt"))
      .reduce(_ || _)
    val targets = offsets.filter(isEndpointBucket)
      .select("l_returnflag", "b", "off", "n")
    // Local rank within (group, bucket), on endpoint buckets only.
    // row_number's tie order is arbitrary but harmless: tied rows carry
    // equal v, so the value found at any given rank is unique.
    val wLocal = Window.partitionBy("l_returnflag", "b").orderBy("v")
    val ranked = raw
      .join(broadcast(targets), Seq("l_returnflag", "b"))
      .withColumn("rn", row_number().over(wLocal).cast(LongType))
      .withColumn("r", col("rn") - 1 + col("off"))
      .filter(qs.map { q =>
        (col("r") === floor(pos(q))) || (col("r") === ceil(pos(q)))
      }.reduce(_ || _))
    def endpoints(q: Double, tag: String): Seq[Column] = Seq(
      max(when(col("r") === floor(pos(q)), col("v"))).as(s"lv$tag"),
      max(when(col("r") === ceil(pos(q)), col("v"))).as(s"hv$tag"))
    def interp(q: Double, tag: String): Column = {
      val p = pos(q)
      val l = floor(p)
      val h = ceil(p)
      when(l === h, col(s"lv$tag"))
        .otherwise(col(s"lv$tag") * (h.cast(DoubleType) - p) +
          col(s"hv$tag") * (p - l.cast(DoubleType)))
    }
    ranked.groupBy("l_returnflag")
      .agg(max(col("n")).as("n"),
        (endpoints(0.5, "50") ++ endpoints(0.95, "95") ++
          endpoints(0.99, "99")): _*)
      .select(col("l_returnflag"),
        interp(0.5, "50").as("p50"),
        interp(0.95, "95").as("p95"),
        interp(0.99, "99").as("p99"),
        col("n"))
  }

  // --- Q27b: approximate percentiles (scale path) ---------------------------
  /** Sketch-based companion to [[q27Percentiles]]. Exact `percentile` buffers
    * every value per group (l_extendedprice is ~97% distinct), so at 100 TB
    * the per-group buffers are the bottleneck; `approx_percentile` keeps a
    * bounded KLL-style sketch per group with map-side partial merge — the
    * right plan for the reference's p50/p95/p99 lag *monitoring* use-case.
    * Accuracy 10000 ⇒ rank error ≤ 1/10000. Exact q27 remains the oracle-
    * hashed query; this one is rows-only by design (sketch results are
    * engine-specific, like q12b's HLL).
    */
  /** KLL/GK sketch percentiles as a GATE query (VERDICT r04 ask #7): the
    * sketch values are engine-specific, so the driver-checkable output is
    * the group key + exact row count (oracle-recomputable) plus per-
    * percentile tolerance assertions computed HERE against the exact
    * values — the oracle pins them true. The exact reference reuses
    * [[q27Percentiles]]'s two-level distributed counting (bounded memory
    * per stage), NOT `percentile()`, whose ObjectHashAggregate buffers
    * every group value in memory — the 100-TB disqualifier q27's design
    * exists to avoid. The adversarial value-level spec (q27b vs q27)
    * remains in OperatorsSpec. */
  def q27bPercentilesApprox(s: SparkSession, dir: String): DataFrame = {
    val approx = Tables.table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)")
          .as("pcts"),
        count(lit(1)).as("n"))
    val exact = q27Percentiles(s, dir)
      .select(col("l_returnflag"), col("p50"), col("p95"), col("p99"))
    def ok(i: Int, c: String) =
      abs(col("pcts").getItem(i) - col(c)) / col(c) <= 0.02
    approx.join(broadcast(exact), "l_returnflag")
      .select(col("l_returnflag"), col("n"),
        ok(0, "p50").as("p50_within_2pct"),
        ok(1, "p95").as("p95_within_2pct"),
        ok(2, "p99").as("p99_within_2pct"))
  }

  // --- Q28: ordered string aggregation --------------------------------------
  def q28StringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "customer")
      .filter(col("c_custkey") % 100 === 0)
      .groupBy("c_nationkey")
      .agg(expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)").as("names"),
        count(lit(1)).as("n"))

  // --- Q29: conditional aggregation -----------------------------------------
  def q29ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        sum(when(col("o_orderpriority") === "1-URGENT", dec(col("o_totalprice")))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType)
          .as("urgent_total"),
        (sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice"))))
          .cast(DoubleType) / count(when(col("o_orderstatus") === "F", 1)))
          .as("avg_finished_price"))

  // --- Q30: date/time arithmetic --------------------------------------------
  def q30DateArith(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("1995-01-01"))).as("days_since_epoch95"),
        trunc(col("o_orderdate").cast("date"), "month").as("month_start"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        quarter(col("o_orderdate")).as("qtr"))

  // --- Q32: GROUPING SETS ---------------------------------------------------
  // Distinct-dimension rollups in ONE pass over the joined fact — at scale
  // this beats two separate group-bys because the expensive join + shuffle
  // happen once (Catalyst expands the sets map-side).
  def q32GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
    val c = Tables.table(s, dir, "customer")
    val n = Tables.table(s, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("n_name")), Seq(col("o_orderpriority")), Seq.empty),
        col("n_name"), col("o_orderpriority"))
      .agg(grouping(col("n_name")).cast("int").as("g_nation"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n_orders"),
        money(col("o_totalprice")).as("total_price"))
      .select("n_name", "o_orderpriority", "g_nation", "g_prio",
        "n_orders", "total_price")
  }

  // --- Q33: range (band) join -----------------------------------------------
  // Non-equi join of a fact against a tiny band table: Spark plans a
  // BroadcastNestedLoopJoin, which is the right physical shape — the 5-row
  // build side replicates to every executor and the fact never shuffles.
  val PriceBands: Seq[(String, Double, Double)] = Seq(
    ("b1_under_20k", 0.0, 20000.0),
    ("b2_20k_40k", 20000.0, 40000.0),
    ("b3_40k_60k", 40000.0, 60000.0),
    ("b4_60k_80k", 60000.0, 80000.0),
    ("b5_80k_plus", 80000.0, 1e18))

  def q33RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = PriceBands.toDF("band", "lo", "hi")
    Tables.table(s, dir, "lineitem")
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_items"),
        money(col("l_extendedprice")).as("total_price"))
  }

  // --- Q34: gap-based sessionization (batch session_window analog) ----------
  // 30-minute inactivity gap. One shuffle on user_id; the session id is a
  // running sum of gap-break flags — the standard scalable sessionization
  // (the streaming twin uses session_window(), see streaming/WindowedAggs).
  val SessionGapUs: Long = 30L * 60 * 1000000

  def q34Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > SessionGapUs, 1)
          .when(lag(col("ts_us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("int"))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
  }

  // --- Q35: JSON path extraction over a semi-structured column --------------
  // The events table carries a JSON string column (`props`); extraction is
  // a codegen'd scalar (get_json_object) evaluated inside the scan
  // projection — no UDF, no parse-to-struct materialization.
  def q35JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  // --- Q36: correlated scalar subquery (decorrelated by Catalyst) -----------
  /** Orders priced above their own customer's average order price,
    * expressed as TRUE correlated scalar subqueries (`spark.sql`) so
    * Catalyst's RewriteCorrelatedScalarSubquery turns them into aggregated
    * joins — the declarative shape users write, decorrelated for scale
    * instead of executed per row. The predicate cross-multiplies
    * (price·count > sum) so every comparison stays exact DECIMAL — no
    * float boundary for a tie to land on.
    */
  def q36CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.table(s, dir, "orders").createOrReplaceTempView("graft_q36_orders")
    s.sql(s"""
      |SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM graft_q36_orders o
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
      |    (SELECT count(*) FROM graft_q36_orders i
      |     WHERE i.o_custkey = o.o_custkey)
      |  > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |     FROM graft_q36_orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin)
  }

  // --- Q37: RANGE window frame (time-interval rolling sum) ------------------
  /** 30-day rolling spend per customer — a RANGE frame over the order
    * date, which peers by VALUE distance (all rows within 30 days), not
    * row count: the frame type q16/q25's ROWS windows don't cover, and
    * the right semantics for time-based rolling metrics with ties. Exact
    * DECIMAL inside the frame sum, DOUBLE at the boundary.
    */
  def q37RangeFrame(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        expr("""CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
          AS DOUBLE)""").as("spend_30d"))

  // --- Q38: running distinct count over a window ----------------------------
  // Spark (like most engines) rejects COUNT(DISTINCT) with an ORDER BY
  // frame; the scalable exact form is the first-occurrence-flag technique:
  // flag = [row is the first (custkey, priority) occurrence in time order],
  // running distinct = running SUM(flag). Two windows, one shuffle (both
  // partition by custkey), no distinct-state blowup — at 100 TB the flag
  // rides the same sort the running sum needs.
  def q38WindowDistinct(s: SparkSession, dir: String): DataFrame = {
    val first = Window.partitionBy(col("o_custkey"), col("o_orderpriority"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("is_first",
        when(row_number().over(first) === 1, 1L).otherwise(0L))
      .select(col("o_orderkey"), col("o_custkey"),
        sum(col("is_first")).over(running).as("distinct_priorities_so_far"))
  }

  // --- Q31: as-of join (merge-sorted, single shuffle) -----------------------
  // For each purchase event: the user's most recent strictly-earlier view
  // event. Implemented as the scalable as-of algorithm — union both sides,
  // one shuffle on the key, one sort by (time, side, id), then
  // last(ignoreNulls) carries the latest view forward. No range join, no
  // per-row subquery; this shape survives any data volume.
  def q31AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        lit(0).as("side"), col("event_id").as("view_event_id"),
        col("ts_us").as("view_ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        lit(1).as("side"), lit(null).cast("long").as("view_event_id"),
        lit(null).cast("long").as("view_ts_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(purchases)
      .withColumn("asof_view_id", last(col("view_event_id"), ignoreNulls = true).over(w))
      .withColumn("asof_view_ts", last(col("view_ts_us"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_ts_us"),
        col("asof_view_id"), col("asof_view_ts"))
  }

  /** Microseconds per week — the cohort bucket for [[q41CohortRetention]]
    * (pure integer epoch math, the q17 bucket convention). */
  private val WeekUs = 7L * 86400L * 1000000L

  // --- Q41: cohort retention ------------------------------------------------
  /** The classic product-analytics retention matrix: each user joins the
    * cohort of their first active week; for every (cohort, week-offset)
    * cell, how many of that cohort's users were active, and the retained
    * fraction of the cohort. Distinct user-weeks first (one user-keyed
    * aggregation), cohorts as a min over them, then one join back on
    * user_id (both sides already user-keyed) and a final cell
    * aggregation — no per-week self-joins, so the shape is three
    * user/cell-keyed shuffles regardless of how many weeks of history
    * the corpus holds. Counts are exact integers; `retention` is one
    * boundary division. */
  def q41CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts_us DIV $WeekUs").as("week"))
      .distinct()
    val cohorts = weeks.groupBy("user_id")
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_cohort"))
    weeks.join(cohorts, "user_id")
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        col("n_cohort"),
        (col("n_users").cast(DoubleType) / col("n_cohort")).as("retention"))
  }

  // --- Q42: ordered event funnel ---------------------------------------------
  /** The default funnel [[q42EventFunnel]] reports (and the oracle pins):
    * signup → view → click → purchase. */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Ordered-sequence funnel over the event stream: users who performed
    * each step's event type STRICTLY after the previous step's in event
    * time (default [[FunnelSteps]]; any ordered event-type sequence
    * works — the steps are data, not code). Each step is one filtered
    * user-keyed min-aggregation joined to the previous step's frontier
    * (|steps| chained user-keyed shuffles, no window over the whole event
    * stream, no per-row subqueries); the final report is one row per step
    * with step conversion as a lag-window division. */
  def q42EventFunnel(s: SparkSession, dir: String): DataFrame =
    q42EventFunnel(s, dir, FunnelSteps)

  def q42EventFunnel(s: SparkSession, dir: String,
      stepTypes: Seq[String]): DataFrame =
    funnelOf(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us")), stepTypes)

  /** The [[q42EventFunnel]] pipeline over an arbitrary
    * `(user_id, event_type, ts_us)` frame, for spec-supplied streams. */
  private[graft] def funnelOf(ev: DataFrame,
      stepTypes: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty, "a funnel needs at least one step")
    val first = ev.filter(col("event_type") === stepTypes.head)
      .groupBy("user_id").agg(min(col("ts_us")).as("t"))
    def next(prev: DataFrame, typ: String): DataFrame =
      ev.filter(col("event_type") === typ)
        .join(prev.select(col("user_id"), col("t").as("tp")), "user_id")
        .filter(col("ts_us") > col("tp"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t"))
    val frames = stepTypes.tail.scanLeft(first)(next)
    // order by the NUMERIC step index, not the label: "10_x" sorts
    // between "1_a" and "2_b" lexicographically, which would pair step 10
    // with step 1 in the lag once a funnel reaches 10+ steps
    val counts = stepTypes.zip(frames).zipWithIndex.map {
      case ((typ, df), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("idx"),
            lit(s"${i + 1}_$typ").as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
    val w = Window.orderBy(col("idx"))
    counts
      .withColumn("conv_from_prev",
        coalesce(col("n_users").cast(DoubleType) /
          lag(col("n_users"), 1).over(w), lit(1.0)))
      .select("step", "n_users", "conv_from_prev")
  }

  // --- Q45: small-quantity-order revenue (TPC-H Q17 shape) ------------------
  /** Average yearly revenue that would be lost if orders below 20% of
    * their part's average order quantity were no longer filled — the
    * TPC-H Q17 correlated-average pattern. The per-part average
    * comparison is CROSS-MULTIPLIED (5·qty·cnt < sum_qty) so every
    * comparison stays exact DECIMAL — no double division inside the
    * filter; the only double is the final /7 boundary. Shape at scale:
    * the brand dim broadcasts into the fact scan, the per-part average is
    * one narrow (partkey)-keyed aggregate joined back on the fact's own
    * key, and Catalyst never executes a per-row subquery. */
  def q45SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val pq = (c: Column) => c.cast(DecimalType(18, 2))
    val li = Tables.table(s, dir, "lineitem")
    val parts = Tables.table(s, dir, "part")
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    val perPart = li.groupBy("l_partkey")
      .agg(sum(pq(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("cnt"))
    li.join(broadcast(parts), li("l_partkey") === parts("p_partkey"))
      .join(perPart, "l_partkey")
      .filter(pq(col("l_quantity")) * col("cnt") * 5 < col("sum_qty"))
      .agg((sum(pq(col("l_extendedprice"))).cast(DoubleType) / 7.0)
        .as("avg_yearly"))
  }

  /** Grid width for [[q44SeriesTopK]]'s band decomposition: the hot
    * band's n² pair work spreads over salts² join cells. 8 bounds any
    * single cell at (n_b/8)² while replicating only N rows of peak key
    * + 24-slot profile vector 8× per side — linear replication traded
    * against ever exchanging the n² pair stream. */
  val Q44BandSalts = 8

  // --- Q44: per-user activity-series similarity search ----------------------
  /** Time-series similarity search over the event stream (the streaming
    * series-similarity problem of the EDBT 2019 line in PAPERS.md, recast
    * relationally): each user's 24-bucket hour-of-day activity profile
    * (exact DECIMAL sums of `value` per hour), candidate pairs banded by
    * PEAK activity hour — the d02/s02 banding idea applied to series, so
    * the pairing is |users|²/24 per band, never all-pairs — then exact
    * cosine over the full profiles for candidates only and the top-3
    * most-similar users per user.
    *
    * Exactness: per-bucket sums and the dot products are DECIMAL (order-
    * independent — a float sum would hash-differ per partition layout);
    * doubles appear only at the final cosine boundary, the s01 contract.
    * Shape at 100 TB: the profile is one fact aggregation (24 rows/user)
    * folded into a 24-slot vector ([[seriesVectors]]), and the per-pair
    * dot is computed in-stage over the candidate's two attached vectors
    * ([[graft.functions.DecimalSeriesDot]]) — no per-hour row explosion.
    * The candidate band join does NOT key on bare peak_hour: 24 values
    * with human activity clustered into a few of them is the skewed
    * low-cardinality key whose hot band does Σ n_b² work in ONE shuffle
    * partition at 100× users (VERDICT r08 item 1). Every band is hot by
    * construction, so the pairing grid-decomposes unconditionally
    * ([[graft.ops.SaltedJoin.selfPairsGridDirected]]): the join keys on
    * (peak_hour, cell_i, cell_j) — 24·salts² cells of (n_b/salts)²
    * comparisons — and the output is bit-identical to the plain band
    * self-join, so the oracle is unchanged. */
  def q44SeriesTopK(s: SparkSession, dir: String,
      salts: Int = Q44BandSalts): DataFrame = {
    val (prof, n2) = seriesProfiles(s, dir)
    val peak = prof
      // asc_nulls_last: Spark's plain asc orders NULL first where the
      // oracle's ORDER BY defaults NULLS LAST — on a corpus with
      // null-timestamp events, a null-hour v tying the max would pick
      // a different peak per engine; nulls-last pins the same choice
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("v").desc, col("hour").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("hour").as("peak_hour"))
    // vectors ride THROUGH the grid join (`keep`): the N²/24-shaped
    // pair stream is scored where it is generated, never re-joined —
    // the same zero-pair-exchange shape as q44b's cluster self-join
    val pw = peak.join(seriesVectors(prof, n2), "user_id")
    val pairs = graft.ops.SaltedJoin
      .selfPairsGridDirected(pw, Seq("peak_hour"), "user_id", salts,
        keep = Seq("varr", "n2"))
      .select(col("a").as("qa"), col("b").as("qb"),
        col("a_varr").as("va"), col("b_varr").as("vb"),
        col("a_n2").as("na"), col("b_n2").as("nb"))
    seriesTopKOfVec(pairs)
  }

  /** Shared q44/q44b inputs: the per-user 24-bucket hourly activity
    * profile (exact DECIMAL sums) and its squared norm. */
  private def seriesProfiles(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val d18 = (c: Column) => c.cast(DecimalType(18, 6))
    val prof = Tables.events(s, dir)
      .select(col("user_id"),
        (expr("ts_us div 3600000000") % 24).as("hour"), col("value"))
      .filter(col("value").isNotNull)
      .groupBy("user_id", "hour")
      .agg(d18(sum(col("value").cast(DecimalType(12, 6)))).as("v"))
    val n2 = prof.groupBy("user_id")
      .agg(sum(col("v") * col("v")).as("n2"))
    (prof, n2)
  }

  /** Shared q44/q44b profile VECTORS: [[seriesProfiles]] folded into a
    * 24-slot hourly array per user (slot h = v at hour h, NULL where the
    * user has no hour-h activity) with the squared norm attached.
    * Null-vs-zero matters: the scoring and assignment contracts key on
    * hour PRESENCE — the relational form's inner join on `hour` scores a
    * pair iff it shares ≥1 present hour, and a present-but-zero sum
    * still counts as presence — so absent slots are NULL, never 0.
    *
    * WHY vectors: the relational tail exploded every candidate ×24 hour
    * rows across two exchanges and a hash aggregate; at q44b's 100×
    * study point those N·K assignment and Σ|cluster|² scoring streams
    * overran the sandbox's spill disk (SCALETREND r14). In vector form
    * the exact-DECIMAL dot ([[graft.functions.DecimalSeriesDot]],
    * codegen, BigDecimal-exact — identical values to the hour-join
    * `sum(va*vb)`) is computed WHERE THE PAIR IS GENERATED: nothing
    * wider than N rows of 24-slot arrays ever crosses an exchange. */
  private def seriesVectors(prof: DataFrame, n2: DataFrame): DataFrame = {
    // null-hour rows (events with a null timestamp) stay OUT of the map
    // — the relational hour join never matched them — but their v still
    // contributes to n2, exactly as before. An hour OUTSIDE [0, 23]
    // (only reachable from pre-epoch timestamps, where Spark's
    // truncating `div` and the oracle's floor division already diverge)
    // would be silently dropped from the 24 slots while the hour join
    // kept it — fail loudly instead of returning a wrong dot
    val slots = prof.filter(col("hour").isNotNull)
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(
        when(col("hour").between(0, 23), col("hour"))
          .otherwise(raise_error(concat(
            lit("seriesVectors: hour outside [0, 23]: "),
            col("hour").cast("string")))),
        col("v")))).as("hm"))
      .select(col("user_id"), expr(
        "transform(sequence(0, 23), h -> try_element_at(hm, CAST(h AS BIGINT)))")
        .as("varr"))
    slots.join(n2, "user_id")
  }

  /** Shared q44/q44b scoring tail over vector-attached DIRECTED pairs
    * `(qa, qb, va, vb, na, nb)`: exact DECIMAL cosine and the
    * deterministic top-3 per user (doubles only at the cosine boundary,
    * the s01 contract). */
  private def seriesTopKOfVec(pairs: DataFrame): DataFrame = {
    import graft.functions.DecimalSeriesDot.decimal_series_dot
    val scored = pairs
      .withColumn("dot", decimal_series_dot(col("va"), col("vb")))
      // dot NULL ⇔ no common present hour — the pair the relational
      // form's inner join on hour never produced
      .filter(col("dot").isNotNull && col("na") > 0 && col("nb") > 0)
      .select(col("qa").as("qid"), col("qb").as("neighbor_id"),
        (col("dot").cast(DoubleType) /
          (sqrt(col("na").cast(DoubleType)) *
            sqrt(col("nb").cast(DoubleType)))).as("cos_sim"))
    // top-3 via the bounded aggregate, NOT a row_number window: the
    // window shape shuffles and SORTS every scored pair per qid — where
    // the ObjectHashAggregate keeps a 3-element heap per qid and its
    // partial ships at most 3 rows per (map task, qid). Ordering is
    // encoded as an ascending sort-key struct (−cos_sim, neighbor_id);
    // double negation is IEEE-order-exact (no NaN past the na/nb > 0
    // filter), so ranks, ties, and survivors match the window form
    // exactly.
    import graft.functions.BoundedTopK.bounded_top_k
    scored
      .groupBy(col("qid"))
      .agg(bounded_top_k(
        struct((-col("cos_sim")).as("nc"), col("neighbor_id").as("nid")),
        3).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("t.nid").as("neighbor_id"), (-col("t.nc")).as("cos_sim"))
  }

  /** Coarse-cluster stride for [[q44bSeriesTopKClustered]]: centroids
    * are the users with `user_id % stride == 0`. The default derives
    * `stride = ⌊√N⌋` from the count of users with activity (n2 > 0) —
    * K ≈ √N at ANY corpus size, so the N·K assignment and the
    * Σ|cluster|² candidate pass both stay N^1.5 (a flat stride makes
    * K ∝ N and the assignment quadratic — SCALETREND r12 measured it at
    * ×35 on 10× data). The oracle replays the identical count-derived
    * stride in SQL; [[Similarity.AdaptiveStride]] is the sentinel. */
  val Q44bClusterStride = Similarity.AdaptiveStride

  /** q44's subquadratic sibling — the answer to SCALETREND.md's ×106
    * flag on the exact banded all-pairs: the SemDeDup/IVF recipe
    * (d18/s03's coarse clustering) applied to activity series. Users
    * are assigned to their nearest coarse centroid (a deterministic
    * user-id-stride sample of the profiles, argmax cosine with ties to
    * the smallest cid), and candidates are pairs WITHIN a cluster only
    * — K clusters of ~N/K users cost N²/K comparisons, so K ≈ √N makes
    * the pairing N^1.5 where q44's per-band all-pairs is N²/24.
    * APPROXIMATE by design: a cross-cluster true neighbor is missed —
    * the exactness/scalability trade the s-family makes, here in an
    * oracle-checkable relational form (assignment and scoring are
    * deterministic, so DuckDB replays the identical answer set).
    * Scoring, tie rules, and output shape are q44's exactly. */
  def q44bSeriesTopKClustered(s: SparkSession, dir: String,
      stride: Int = Q44bClusterStride): DataFrame = {
    val (prof, n2) = seriesProfiles(s, dir)
    val st =
      if (stride == Similarity.AdaptiveStride)
        Similarity.adaptiveStride(
          graft.ops.CorpusCount.memo(n2.filter(col("n2") > 0)))
      else stride
    import graft.functions.DecimalSeriesDot.decimal_series_dot
    val vec = seriesVectors(prof, n2).filter(col("n2") > 0)
    val cents = vec.filter(col("user_id") % st === 0)
      .select(col("user_id").as("cid"), col("varr").as("carr"),
        col("n2").as("cn2"))
    // assignment: user × centroid exact-DECIMAL cosine with the K
    // centroid VECTORS broadcast (K ≈ √N ≪ N by construction) — the N·K
    // dot pass runs inside the stage (no per-hour row explosion, no N·K
    // exchange: the hash-aggregate sort-fallback of the former hour-join
    // form was the 100× study point's spill site, SCALETREND r14). A
    // (user, centroid) with no common present hour has a NULL dot — the
    // hour join never produced that candidate row — and the argmax is a
    // partial-aggregating max over (ccos, −cid): ties break to the
    // SMALLEST cid, the row_number (ccos DESC, cid ASC) contract. −cid
    // is exact integer negation; ccos carries no NaN (n2, cn2 > 0) and
    // no −0.0 (a zero dot casts to +0.0 and the norms are positive).
    val cdot = vec.select("user_id", "varr", "n2")
      .crossJoin(broadcast(cents))
      .select(col("user_id"), col("cid"),
        (decimal_series_dot(col("varr"), col("carr")).cast(DoubleType) /
          (sqrt(col("n2").cast(DoubleType)) *
            sqrt(col("cn2").cast(DoubleType)))).as("ccos"))
      .filter(col("ccos").isNotNull)
    val assign = cdot
      .groupBy("user_id")
      .agg(max(struct(col("ccos"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("user_id"), (-col("best.ncid")).as("cid"))
    // pairs WITHIN a cluster, vectors already attached: the Σ|cluster|²
    // candidate stream is generated and scored in the same stage — only
    // the N-row assign/vec frames cross the self-join's exchange
    val aw = assign.join(vec, "user_id")
    val pairs = aw.as("a").join(aw.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.user_id") =!= col("b.user_id"))
      .select(col("a.user_id").as("qa"), col("b.user_id").as("qb"),
        col("a.varr").as("va"), col("b.varr").as("vb"),
        col("a.n2").as("na"), col("b.n2").as("nb"))
    seriesTopKOfVec(pairs)
  }

  /** Per-order distinct-part cap for [[q43CopurchasePairs]]: a basket
    * with b items contributes b·(b−1)/2 pairs, so one pathological
    * order would dominate the join quadratically — the d04 df-cap
    * guard applied to basket mining. TPC-H orders hold ≤ 7 lines, so
    * the cap is headroom, not a result filter, on this corpus. */
  val MaxBasketSize = 15

  // --- Q43: co-purchase pair mining -----------------------------------------
  /** Frequent-pair (market-basket) mining over the order/part fact: the
    * top co-purchased part pairs by number of shared orders. Distinct
    * (order, part) first, the basket-size cap above, then ONE
    * equi-self-join on the order key with `part_a < part_b` — the pair
    * blowup is bounded by cap²/2 per order, never all-parts×all-parts —
    * and a (pair)-keyed count. Deterministic top-20 (ties break on the
    * pair ids); counts exact. */
  def q43CopurchasePairs(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.table(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val capped = items
      .withColumn("n_items", count(lit(1)).over(Window.partitionBy(col("ok"))))
      .filter(col("n_items") <= MaxBasketSize)
      .select("ok", "pk")
    capped.as("a").join(capped.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
  }

  /** Late-shipment window for [[q46WaitingSuppliers]]: a line is "late"
    * when it ships more than this many days after its order date (the
    * corpus carries no commit/receipt dates, so order→ship latency is
    * the Q21 lateness signal). */
  val LateShipDays = 90

  // --- Q46: waiting suppliers (TPC-H Q21 shape) -----------------------------
  /** Suppliers who were the SOLE late shipper on a multi-supplier
    * finished order — TPC-H Q21's double-correlated EXISTS / NOT EXISTS,
    * the hardest quantifier shape in the benchmark. Spark-first
    * reformulation: instead of re-probing the fact twice per row (the
    * literal l2/l3 subqueries — two more shuffles of the fat fact), the
    * per-order evidence collapses into ONE narrow aggregate —
    * `(n_supp, n_late_supp)` per order key — and the quantifier pair
    * becomes the predicate `n_supp >= 2 AND n_late_supp = 1` joined back
    * on the fact's own key: EXISTS another supplier ⇔ n_supp ≥ 2;
    * NOT EXISTS another LATE supplier, given this row is late, ⇔ this
    * supplier is the only late one. Identical semantics (the oracle runs
    * the literal subquery form), one fact aggregation instead of two
    * fact joins at 100 TB. Dims broadcast; top-20 deterministic. */
  def q46WaitingSuppliers(s: SparkSession, dir: String): DataFrame =
    q46WaitingSuppliers(s, dir, Some("NATION_7"))

  /** [[q46WaitingSuppliers]] with the supplier-nation filter as a
    * parameter (`None` = all nations) — the q42 pattern: the published
    * query is one binding of a reusable operator. */
  def q46WaitingSuppliers(s: SparkSession, dir: String,
      nation: Option[String]): DataFrame = {
    val o = Tables.table(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val lo = Tables.table(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate") > date_add(col("o_orderdate"), LateShipDays))
          .as("late"))
    val perOrder = lo.groupBy("ok")
      .agg(countDistinct(col("sk")).as("n_supp"),
        countDistinct(when(col("late"), col("sk"))).as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select("ok")
    val nat = nation.foldLeft(Tables.table(s, dir, "nation"))(
      (df, n) => df.filter(col("n_name") === n))
    val sup = Tables.table(s, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    lo.filter(col("late"))
      .join(perOrder, "ok")
      .join(broadcast(sup), col("sk") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  /** Dormancy cutoff for [[q47DormantHighBalance]]: a customer with no
    * orders on/after this date counts as dormant (every customer in the
    * corpus has SOME order, so Q22's literal "no orders ever" anti join
    * would be vacuously empty — the recency cutoff keeps the anti-join
    * shape meaningful). */
  val DormantCutoff = "2000-01-01"

  // --- Q47: dormant high-balance customers (TPC-H Q22 shape) ----------------
  /** Customers whose balance exceeds the positive-balance average yet
    * placed no order since [[DormantCutoff]], rolled up per nation —
    * TPC-H Q22's shape: an uncorrelated scalar aggregate feeding a
    * filter, then an anti join against the fact. The average comparison
    * is CROSS-MULTIPLIED (`bal · n > sum`, the q45 trick) so the filter
    * compares exact DECIMALs — no double division inside the predicate.
    * Shape at 100 TB: the scalar is a 1-row broadcast, the anti join is
    * key-shuffled only on the (date-pruned) recent slice of orders, and
    * the nation dim broadcasts; doubles appear only at the final sum
    * boundary. */
  def q47DormantHighBalance(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.table(s, dir, "customer")
    val posAvg = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("pos_sum"),
        count(lit(1)).as("pos_n"))
    val recent = Tables.table(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(DormantCutoff))
      .select("o_custkey")
    val nat = Tables.table(s, dir, "nation")
    cust.crossJoin(broadcast(posAvg)) // 1-row scalar broadcast
      .filter(dec(col("c_acctbal")) * col("pos_n") > col("pos_sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast(DoubleType).as("totacctbal"))
  }

  /** Order-total quantity threshold for [[q48LargeVolumeCustomers]] —
    * TPC-H Q18 uses 300+; 250 keeps a non-trivial result (~200 orders)
    * at the sf0.01 oracle scale. */
  val LargeVolumeQty = 250

  // --- Q48: large-volume customers (TPC-H Q18 shape) ------------------------
  /** Customers behind the largest-quantity orders — TPC-H Q18: an IN
    * subquery over a grouped-HAVING fact aggregate, re-joined through
    * orders to customers. Spark-first: the IN list IS the aggregate
    * (`sum_qty > threshold` kept as a column, no second fact pass — the
    * literal Q18 also re-aggregates lineitem in the outer query; here
    * one aggregation serves both roles). Quantities sum as exact
    * DECIMAL; the HAVING filter prunes before the orders join so only
    * qualifying order keys shuffle. Deterministic top-20 by price then
    * key. */
  def q48LargeVolumeCustomers(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.table(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > LargeVolumeQty)
    val o = Tables.table(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = Tables.table(s, dir, "customer").select("c_custkey", "c_name")
    o.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        dec(col("o_totalprice")).cast(DoubleType).as("o_totalprice"),
        col("sum_qty").cast(DoubleType).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  // --- Q49: disjunctive-predicate revenue (TPC-H Q19 shape) -----------------
  /** Discounted revenue under an OR-of-ANDs predicate spanning BOTH join
    * sides — TPC-H Q19, the classic test of disjunctive predicate
    * handling. Spark-first: the per-side residues of the disjunction
    * ARE pushable (`p_brand IN (b1,b2,b3)`, `p_size BETWEEN 1 AND 15`,
    * `l_quantity BETWEEN 1 AND 30`), so each scan prunes with the
    * disjunction's envelope while the exact OR evaluates post-join —
    * Catalyst derives part of this, and the envelope conjuncts are
    * stated explicitly so the parquet scans prune even where the
    * optimizer's disjunction factoring stops. Money stays DECIMAL until
    * the single output boundary. */
  def q49DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val branches = Seq(("Brand#1", 1, 11, 5), ("Brand#2", 10, 20, 10),
      ("Brand#3", 20, 30, 15))
    val p = Tables.table(s, dir, "part")
      .filter(col("p_brand").isin(branches.map(_._1): _*) &&
        col("p_size").between(1, branches.map(_._4).max))
      .select("p_partkey", "p_brand", "p_size")
    val l = Tables.table(s, dir, "lineitem")
      .filter(col("l_quantity").between(branches.map(_._2).min,
        branches.map(_._3).max))
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val disj = branches.map { case (b, qLo, qHi, szHi) =>
      col("p_brand") === b && col("l_quantity").between(qLo, qHi) &&
        col("p_size").between(1, szHi)
    }.reduce(_ || _)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(disj)
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
  }

  // --- Q51: time-bucket gap fill + LOCF + linear interpolation --------------
  /** The TimescaleDB `time_bucket_gapfill` / `locf` / `interpolate`
    * surface (the reference's hypertable sink is a TimescaleDB analog —
    * `src/sinks/timescaledb.py:89-139` — and THIS is the query its users
    * run on sparse series): per event type, the dense hour spine from
    * first to last observation (`sequence` + explode — no driver loop,
    * no cross join against a global calendar), observed buckets joined
    * on, and two reconstructions for the holes — last-observation-
    * carried-forward, and linear interpolation between the surrounding
    * observations. Bucket sums stay exact DECIMAL; the interpolation is
    * double arithmetic at the boundary with the identical operation
    * order on both engines. The spine's ends are observations by
    * construction (min/max of the observed hours), so neither
    * reconstruction is ever null. Shape at 100 TB: one fact aggregation,
    * a per-type spine explode proportional to the time range, and two
    * windows over the (event_type)-keyed spine — no shuffle beyond the
    * aggregation's. */
  def q51GapfillInterpolate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"), expr("ts_us div 3600000000").as("h"),
        col("value").cast(DecimalType(12, 6)).as("v"))
    val sparse = ev.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("vsum"))
    val spine = sparse.groupBy("event_type")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
    val joined = spine.join(sparse, Seq("event_type", "h"), "left")
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(col("vsum"), ignoreNulls = true).over(wPrev)
    val prevH = last(when(col("vsum").isNotNull, col("h")),
      ignoreNulls = true).over(wPrev)
    val nextV = first(col("vsum"), ignoreNulls = true).over(wNext)
    val nextH = first(when(col("vsum").isNotNull, col("h")),
      ignoreNulls = true).over(wNext)
    val interp = when(col("vsum").isNotNull, col("vsum").cast(DoubleType))
      .otherwise(prevV.cast(DoubleType) +
        (nextV.cast(DoubleType) - prevV.cast(DoubleType)) *
          ((col("h") - prevH).cast(DoubleType) /
            (nextH - prevH).cast(DoubleType)))
    joined.select(col("event_type"), col("h"),
        when(col("vsum").isNotNull, 1).otherwise(0).as("present"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        prevV.cast(DoubleType).as("locf_sum"), interp.as("interp_sum"))
  }

  // --- Q52: statistical moments from exact sums ------------------------------
  /** Per-group variance, stddev, covariance, and correlation of
    * (quantity, price) — the statistics family — computed from the five
    * EXACT decimal power/cross sums (Σx, Σy, Σx², Σy², Σxy) rather than
    * the built-in `var_pop`/`corr`: the built-ins stream float partial
    * aggregates whose result depends on partition order (and whose
    * Welford-style updates differ between engines), while sums of exact
    * decimals are order-independent, so the moments assembled from them
    * at the double boundary — n·Σxy − Σx·Σy over the root product, the
    * textbook identities — hash-match bit-for-bit. One aggregation, one
    * tiny projection; the identity-based form is also the map-side-
    * combinable one a 100 TB scan needs (Welford can't partial-combine
    * without the same identity shuffle). */
  def q52StatsMoments(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(s, dir, "lineitem")
      .select(col("l_returnflag"), dec(col("l_quantity")).as("x"),
        dec(col("l_extendedprice")).as("y"))
    val sums = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    def d(c: Column) = c.cast(DoubleType)
    val nD = d(col("n"))
    val varX = (nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))) / (nD * nD)
    val varY = (nD * d(col("syy")) - d(col("sy")) * d(col("sy"))) / (nD * nD)
    val cov = (nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / (nD * nD)
    // a zero-variance group's n·Σx²−Σx² is 0 in reals but can round a few
    // ulps negative in doubles; DuckDB's sqrt throws on negatives while
    // Spark yields NaN — clamp the radicands so both engines agree
    val corr = (nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
      (sqrt(greatest(nD * d(col("sxx")) - d(col("sx")) * d(col("sx")),
          lit(0.0))) *
        sqrt(greatest(nD * d(col("syy")) - d(col("sy")) * d(col("sy")),
          lit(0.0))))
    sums.select(col("l_returnflag"), col("n"),
        varX.as("var_qty"),
        sqrt(greatest(varX, lit(0.0))).as("stddev_qty"),
        varY.as("var_price"), cov.as("cov_qty_price"),
        corr.as("corr_qty_price"))
  }

  // --- Q50: customer order-count distribution (TPC-H Q13 shape) -------------
  /** How many customers placed exactly k orders — TPC-H Q13's
    * back-to-back aggregation over a LEFT join (the join predicate
    * carries the filter, so 0-order customers survive into the k = 0
    * bucket; an inner join or a WHERE would silently drop them). First
    * aggregate keys on the customer (the join key — no extra exchange
    * under AQE), second on the tiny count domain. */
  def q50CustDist(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.table(s, dir, "customer").select("c_custkey")
    val o = Tables.table(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  // --- Q55: min-cost supplier (TPC-H Q2 shape) ------------------------------
  /** Region and part-size binding for [[q55MinCostSupplier]]. */
  val Q55Region = "ASIA"
  val Q55MaxPartSize = 15

  /** Per-part minimum-cost supplier inside one region — TPC-H Q2, the
    * classic correlated-scalar-subquery decorrelation: the literal form
    * re-runs `min(price) WHERE partkey = outer.partkey` per candidate
    * row. Spark-first: the region-filtered supplier dim broadcasts into
    * ONE pass over the fact, the per-part minimum is ONE aggregation of
    * that pass, and the correlation collapses into an equi-join back on
    * (partkey, price == min) — the q46/q47 pattern; no per-row re-probe
    * exists in the plan. The corpus has no partsupp table, so lineitem
    * plays the part-supplier price list (`l_extendedprice` per
    * (l_partkey, l_suppkey) line); DISTINCT collapses repeat lines at
    * the same min price, as Q2's unique partsupp key would. `min` of a
    * raw double involves no arithmetic, so no decimal ladder is needed;
    * the top-100 sort is fully tie-broken (p_partkey + s_name). */
  def q55MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.table(s, dir, "nation")
    val r = Tables.table(s, dir, "region").filter(col("r_name") === Q55Region)
    val sup = Tables.table(s, dir, "supplier")
      .join(broadcast(n.join(broadcast(r),
        col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val asia = Tables.table(s, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
    val minp = asia.groupBy("l_partkey")
      .agg(min(col("l_extendedprice")).as("min_price"))
    val parts = Tables.table(s, dir, "part")
      .filter(col("p_size") <= Q55MaxPartSize)
      .select("p_partkey", "p_brand")
    asia.join(minp, "l_partkey")
      .filter(col("l_extendedprice") === col("min_price"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("min_price"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  // --- Q56: top revenue supplier (TPC-H Q15 shape) --------------------------
  /** Quarter window for [[q56TopSupplierRevenue]]. */
  val Q56WindowStart = "1997-01-01"
  val Q56WindowEnd = "1997-04-01"

  /** Supplier(s) with the maximum windowed revenue — TPC-H Q15's
    * max-over-aggregated-view: the view aggregates once, and the
    * `revenue = (SELECT max(revenue) FROM view)` correlation is a 1-row
    * scalar broadcast joined as a filter, not a per-row subquery. The
    * revenue sums are DECIMAL (order-independent) and the max/equality
    * comparison happens ON the decimal, so the "which suppliers tie"
    * decision is exact — a double sum would make the tie set partition-
    * layout-dependent; doubles appear only in the output column. At
    * 100 TB: one shuffle (the suppkey agg) + two broadcasts. */
  def q56TopSupplierRevenue(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val rev = Tables.table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit(Q56WindowStart)) &&
        col("l_shipdate") < to_timestamp(lit(Q56WindowEnd)))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .as("rev"))
    val mx = rev.agg(max(col("rev")).as("mx"))
    val sup = Tables.table(s, dir, "supplier").select("s_suppkey", "s_name")
    rev.crossJoin(broadcast(mx))
      .filter(col("rev") === col("mx"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast(DoubleType).as("total_revenue"))
  }

  // --- Q57: supplier-count by part attributes (TPC-H Q16 shape) -------------
  /** Exclusions for [[q57PartSupplierCounts]]: brand/type screened out,
    * the size whitelist, and the "customer complaints" analog — the
    * corpus has no s_comment, so a negative account balance plays the
    * excluded-supplier predicate. */
  val Q57ExcludedBrand = "Brand#5"
  val Q57ExcludedType = "PROMO"
  val Q57Sizes: Seq[Int] = Seq(1, 9, 14, 19, 23, 36, 45, 49)

  /** Distinct-supplier counts per (brand, type, size) with a NOT-IN
    * exclusion list — TPC-H Q16. The NOT IN subquery is a broadcast
    * ANTI join (s_suppkey is non-null, so NOT IN ≡ anti join — the
    * null-poisoning caveat doesn't arise); part attributes broadcast;
    * the only shuffle is the distinct-count aggregation. */
  def q57PartSupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.table(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val p = Tables.table(s, dir, "part")
      .filter(col("p_brand") =!= Q57ExcludedBrand &&
        col("p_type") =!= Q57ExcludedType &&
        col("p_size").isin(Q57Sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.table(s, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  // --- Q59: priority counts of late orders (TPC-H Q4 shape) -----------------
  /** Order-priority window for [[q59LateOrderPriorities]]. */
  val Q59WindowStart = "1997-01-01"
  val Q59WindowEnd = "1997-04-01"

  /** Per-priority counts of orders with at least one late line — TPC-H
    * Q4's EXISTS quantifier. The corpus carries no commit/receipt dates,
    * so order→ship latency beyond [[LateShipDays]] is the lateness
    * signal (the q46 convention). Spark-first: EXISTS is ONE left-semi
    * join of the date-pruned orders against their late lines (the
    * lateness predicate rides the join condition — no fact re-probe per
    * row), then a 5-group count. */
  def q59LateOrderPriorities(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit(Q59WindowStart)) &&
        col("o_orderdate") < to_timestamp(lit(Q59WindowEnd)))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.table(s, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
    o.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > date_add(col("o_orderdate"), LateShipDays),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  // --- Q60: forecast revenue change (TPC-H Q6 shape) ------------------------
  /** Discount corridor and quantity cap for [[q60ForecastRevenue]]. */
  val Q60WindowStart = "1997-01-01"
  val Q60WindowEnd = "1998-01-01"

  /** The what-if revenue of eliminating a discount band — TPC-H Q6: one
    * scan, every predicate pushed, one exact-decimal product sum. The
    * simplest query in the benchmark and the purest pushdown proof: at
    * 100 TB the plan is scan→filter(pushed)→partial-agg→1-row exchange. */
  def q60ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit(Q60WindowStart)) &&
        col("l_shipdate") < to_timestamp(lit(Q60WindowEnd)) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast(DoubleType).as("revenue"))

  // --- Q61: volume shipping between two nations (TPC-H Q7 shape) ------------
  val Q61NationA = "NATION_1"
  val Q61NationB = "NATION_2"
  val Q61WindowStart = "1996-01-01"
  val Q61WindowEnd = "1998-01-01"

  /** Bilateral shipping volume per (supplier nation, customer nation,
    * year) — TPC-H Q7: the two-nation disjunction stays on the BROADCAST
    * dim pair (supplier-nation × customer-nation both tiny), the fact
    * shuffles once into the 3-key aggregation, and the year derivation
    * is a scan-side projection. Volume sums exact DECIMAL. */
  def q61VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val n = Tables.table(s, dir, "nation").select("n_nationkey", "n_name")
    val sup = Tables.table(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.table(s, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.table(s, dir, "orders").select("o_orderkey", "o_custkey")
    Tables.table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit(Q61WindowStart)) &&
        col("l_shipdate") < to_timestamp(lit(Q61WindowEnd)))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === Q61NationA &&
          col("cust_nation") === Q61NationB) ||
        (col("supp_nation") === Q61NationB &&
          col("cust_nation") === Q61NationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
  }

  // --- Q62: national market share (TPC-H Q8 shape) --------------------------
  val Q62Nation = "NATION_3"
  val Q62Region = "ASIA"
  val Q62PartType = "ECONOMY"
  // dedicated window bindings (same values as Q61's today, but q62's
  // semantics must not silently move when Q61's window is retuned)
  val Q62WindowStart = "1996-01-01"
  val Q62WindowEnd = "1998-01-01"

  /** One nation's share of a region's market for a part type, per order
    * year — TPC-H Q8: the share is a conditional sum over the SAME
    * aggregated rows (one pass — never two scans), both sums exact
    * DECIMAL, the division at the double boundary. All five dims
    * broadcast; the fact shuffles once into the year aggregation. */
  def q62MarketShare(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val p = Tables.table(s, dir, "part")
      .filter(col("p_type") === Q62PartType).select("p_partkey")
    val n = Tables.table(s, dir, "nation")
    val r = Tables.table(s, dir, "region")
      .filter(col("r_name") === Q62Region)
    val custAsia = Tables.table(s, dir, "customer")
      .join(broadcast(n.join(broadcast(r),
        col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supNation = Tables.table(s, dir, "supplier")
      .join(broadcast(Tables.table(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val o = Tables.table(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit(Q62WindowStart)) &&
        col("o_orderdate") < to_timestamp(lit(Q62WindowEnd)))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val vol = (sum(when(col("supp_nation") === Q62Nation,
        dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .otherwise(lit(0))))
    val tot = sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
    Tables.table(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((vol.cast(DoubleType) / tot.cast(DoubleType)).as("mkt_share"))
  }

  // --- Q63: product-type profit (TPC-H Q9 shape) ----------------------------
  /** Unit-cost proxy for [[q63ProductProfit]]: the corpus has no
    * partsupp.ps_supplycost, so half the part's retail price plays the
    * supply cost — the arithmetic SHAPE (per-line profit = revenue −
    * cost·qty, aggregated by nation × year) is Q9's. */
  val Q63PartWord = "bolt"

  def q63ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val d12 = (c: Column) => c.cast(DecimalType(12, 2))
    val half = lit(new java.math.BigDecimal("0.5"))
    val p = Tables.table(s, dir, "part")
      .filter(col("p_name").contains(Q63PartWord))
      .select("p_partkey", "p_retailprice")
    val n = Tables.table(s, dir, "nation").select("n_nationkey", "n_name")
    val sup = Tables.table(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val o = Tables.table(s, dir, "orders").select("o_orderkey", "o_orderdate")
    val profit =
      dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) -
        dec(col("l_discount"))) -
        d12(col("p_retailprice")) * d12(col("l_quantity")) * half
    Tables.table(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(profit).cast(DoubleType).as("sum_profit"))
  }

  // --- Q64: returned-item reporting (TPC-H Q10 shape) -----------------------
  val Q64WindowStart = "1997-01-01"
  val Q64WindowEnd = "1997-04-01"

  /** Top-20 customers by revenue lost to returns in a quarter — TPC-H
    * Q10: returnflag filter pushed into the fact scan, date filter into
    * the orders scan, customer/nation broadcast, one (custkey ×
    * attributes) aggregation, deterministic top-20. */
  def q64ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val o = Tables.table(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit(Q64WindowStart)) &&
        col("o_orderdate") < to_timestamp(lit(Q64WindowEnd)))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.table(s, dir, "customer")
      .join(broadcast(Tables.table(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "c_acctbal", "n_name")
    Tables.table(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // --- Q65: lateness class vs order priority (TPC-H Q12 shape) --------------
  /** Late/on-time line classes vs priority mix — TPC-H Q12's CASE-sum
    * pivot. The corpus carries no l_shipmode, so the lateness class
    * ([[LateShipDays]], the q46/q59 signal) plays the shipmode
    * dimension; the priority mix per class is exactly Q12's
    * high/low-line-count pair. One fact join, one 2-group aggregation. */
  def q65PriorityShipClass(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.table(s, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(when(col("l_shipdate") >
          date_add(col("o_orderdate"), LateShipDays), "late")
        .otherwise("ontime").as("ship_class"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  // --- Q66: promotion revenue share (TPC-H Q14 shape) -----------------------
  val Q66WindowStart = "1997-03-01"
  val Q66WindowEnd = "1997-04-01"

  /** Share of a month's revenue from promotional parts — TPC-H Q14: one
    * fact-month scan, part type broadcast, conditional and total
    * exact-DECIMAL sums from the SAME aggregation, percentage at the
    * double boundary. */
  def q66PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast(DecimalType(18, 2))
    val p = Tables.table(s, dir, "part").select("p_partkey", "p_type")
    val volume = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
    Tables.table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit(Q66WindowStart)) &&
        col("l_shipdate") < to_timestamp(lit(Q66WindowEnd)))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg((sum(when(col("p_type") === "PROMO", volume).otherwise(lit(0)))
          .cast(DoubleType) * 100.0 /
        sum(volume).cast(DoubleType)).as("promo_revenue"))
  }

  // --- Q58: majority-share suppliers (TPC-H Q20 shape) ----------------------
  /** Bindings for [[q58MajorityShareSuppliers]]: the supplier nation,
    * the part-name prefix, and the ship-year window. */
  val Q58Nation = "NATION_3"
  val Q58PartPrefix = "red"
  val Q58WindowStart = "1997-01-01"
  val Q58WindowEnd = "1998-01-01"

  /** Suppliers holding a majority share of some matching part's windowed
    * volume — TPC-H Q20's nested semi-over-aggregation (IN over a
    * grouped HAVING over a correlated total). Decorrelated the
    * warehouse way: ONE (partkey, suppkey) aggregation of the windowed
    * fact, the per-part total derived by RE-AGGREGATING that partial (never
    * rescanning the fact), the share predicate cross-multiplied on
    * exact DECIMALs (`sq · 2 > tot` — no division), and the qualifying
    * supplier set applied as a LEFT SEMI join to the nation-filtered
    * dim. The corpus has no partsupp/availqty, so "majority of this
    * part's shipped volume" plays Q20's half-of-availqty predicate. */
  def q58MajorityShareSuppliers(s: SparkSession, dir: String): DataFrame = {
    val perSP = Tables.table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit(Q58WindowStart)) &&
        col("l_shipdate") < to_timestamp(lit(Q58WindowEnd)))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"))
    val perP = perSP.groupBy(col("l_partkey"))
      .agg(sum(col("sq")).as("tot"))
    val redParts = Tables.table(s, dir, "part")
      .filter(col("p_name").startsWith(Q58PartPrefix))
      .select("p_partkey")
    val qual = perSP.join(perP, "l_partkey")
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .filter(col("sq") * 2 > col("tot"))
      .select(col("l_suppkey")).distinct()
    val nat = Tables.table(s, dir, "nation")
      .filter(col("n_name") === Q58Nation)
    Tables.table(s, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
  }

  // --- Q67: approximate string join (entity resolution) --------------------
  /** Blocking-key prefix width and edit-distance budget for
    * [[q67FuzzyMatch]]. */
  val Q67BlockPrefix = 16
  val Q67MaxEdit = 1

  /** Hot-block occupancy threshold and grid width for [[q67FuzzyMatch]]
    * — the d05b rule applied to ER blocks: a block holding more names
    * than this gets its candidate self-join grid-decomposed. Sized so
    * TPC-H's uniform name prefixes (~100 keys/block) stay on the plain
    * path while a Zipfian surname block — the real-world alarm shape —
    * triggers decomposition. */
  val Q67HotBlockThreshold = 1000L
  val Q67Salts = 8

  /** Blocked fuzzy self-join on customer names — the entity-resolution
    * primitive every CDC-fed warehouse eventually runs (the same
    * logical record arriving under slightly different spellings):
    * candidate pairs are generated ONLY inside a blocking key (the name
    * prefix — at 100 TB Σ block² bounds the quadratic, the standard ER
    * blocking move), then filtered by Levenshtein distance ≤
    * [[Q67MaxEdit]]. A hot block gets the d05b salting treatment: the
    * same occupancy probe + [[graft.ops.SaltedJoin.selfPairsSalted]]
    * grid that de-skews the LSH bands — on real name distributions
    * (Zipfian surnames) one dominant block would otherwise serialize a
    * partition with its n² pair workload, exactly the q44 disease; the
    * grid spreads it over salts² shuffle cells, output bit-identical,
    * and both names ride the grid join (`keep`) so no id→name join
    * re-shuffles the pair table. The engine uses the THRESHOLD form of
    * the edit distance (bails out past the budget: O(k·n) per pair,
    * not O(n²)) — the value equals the true distance for every kept
    * pair, so the plain-distance oracle replays it exactly. Output:
    * the match-pair table a resolution pipeline feeds to its cluster
    * step (d06's connected components). */
  def q67FuzzyMatch(s: SparkSession, dir: String): DataFrame =
    fuzzyMatchPairs(Tables.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_name")))

  /** [[q67FuzzyMatch]] over an explicit `(c_custkey, c_name)` frame —
    * the seam the skew-stress spec injects a Zipfian block through. */
  private[graft] def fuzzyMatchPairs(names: DataFrame,
      hotThreshold: Long = Q67HotBlockThreshold,
      salts: Int = Q67Salts): DataFrame = {
    val c = names.select(col("c_custkey"), col("c_name"),
      substring(col("c_name"), 1, Q67BlockPrefix).as("blk"))
    // the occupancy probe: a distributed map-side-combined aggregate
    // over the blocked index (the same evidence d05b reads) — see
    // selfPairsSaltedByOccupancy for why it is NOT a count window
    graft.ops.SaltedJoin
      .selfPairsSaltedByOccupancy(c, Seq("blk"), "c_custkey",
        hotThreshold, salts, keep = Seq("c_name"))
      .withColumn("edit_dist",
        // at the (default) budget of 1, an exact drop-in for
        // levenshtein(a, b, 1): same 0/1/-1 contract, single
        // allocation-free scan instead of the banded DP — the scalar is
        // the join's dominant term (see functions/EditWithin1 scaladoc;
        // measured ~75% of q67 wall). Any other budget keeps the DP.
        if (Q67MaxEdit == 1)
          graft.functions.EditWithin1.edit_within1(
            col("a_c_name"), col("b_c_name"))
        else levenshtein(col("a_c_name"), col("b_c_name"), Q67MaxEdit))
      .filter(col("edit_dist") >= 0)
      .select(col("a").as("a_key"), col("b").as("b_key"), col("edit_dist"))
  }

  /** Resolved entity table (q68) — [[q67FuzzyMatch]]'s match pairs
    * collapsed to entity ids by d06's min-label propagation (the same
    * proven-fixpoint loop, reused): every customer carries the smallest
    * key reachable through the fuzzy-match graph, `is_canonical` marks
    * the golden record that survives resolution. Together with q67 this
    * is the complete entity-resolution pipeline a CDC-fed warehouse
    * runs — match (blocked approximate join) → resolve (connected
    * components) → keep one canonical row per entity. Components are
    * block-bounded by construction, so the propagation's per-round
    * joins stay proportional to the match-pair table, never customers².
    * Oracle: DuckDB recursive-CTE transitive closure (the d06 rule). */
  def q68EntityClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = q67FuzzyMatch(s, dir)
      .select(col("a_key").as("da"), col("b_key").as("db"))
    val nodes = Tables.table(s, dir, "customer")
      .select(col("c_custkey").as("doc_id"))
    val (labels, _) = Dedup.propagateMinLabels(nodes, pairs)
    // unsorted distributed frame: presentation order is the harness's
    // concern (SparkEntry.canon), never an operator-imposed global sort
    labels.select(col("doc_id").as("c_custkey"),
        col("cluster").as("entity_id"),
        (col("cluster") === col("doc_id")).as("is_canonical"))
  }
}
