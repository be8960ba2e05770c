package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator surface (SURVEY §2.14);
  * `oracleSql` holds the DuckDB-equivalent SQL the driver hash-compares
  * against. Numeric-exactness conventions are documented in
  * [[graft.operators.CoreQueries]].
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q11AggTpchQ1(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_filter_project" -> CoreQueries.q01FilterProject _,
    "q02_mask_sha256" -> CoreQueries.q02MaskSha256 _,
    "q03_latest_state" -> CoreQueries.q03LatestState _,
    "q04_delete_propagation" -> CoreQueries.q04DeletePropagation _,
    "q05_type_cast" -> CoreQueries.q05TypeCast _,
    "q06_max_progress" -> CoreQueries.q06MaxProgress _,
    "q07_join_inner" -> CoreQueries.q07JoinInner _,
    "q08_join_left" -> CoreQueries.q08JoinLeft _,
    "q08b_join_anti" -> CoreQueries.q08bJoinAnti _,
    "q09_join_multiway" -> CoreQueries.q09JoinMultiway _,
    "q10_join_broadcast" -> CoreQueries.q10JoinBroadcast _,
    "q11_agg_tpch_q1" -> CoreQueries.q11AggTpchQ1 _,
    "q12_count_distinct" -> CoreQueries.q12CountDistinct _,
    "q12b_approx_distinct" -> CoreQueries.q12bApproxDistinct _,
    "q13_rollup" -> CoreQueries.q13Rollup _,
    "q14_having_subquery" -> CoreQueries.q14HavingSubquery _,
    "q15_window_rank" -> CoreQueries.q15WindowRank _,
    "q16_window_analytic" -> CoreQueries.q16WindowAnalytic _,
    "q17_time_bucket" -> CoreQueries.q17TimeBucket _,
    "q18_topk" -> CoreQueries.q18TopK _,
    "q19_setops" -> CoreQueries.q19SetOps _,
    "q20_scalar" -> CoreQueries.q20Scalar _,
    "q21_array_json" -> CoreQueries.q21ArrayJson _,
    "q22_mask_hmac" -> CoreQueries.q22MaskHmac _,
  )

  // DuckDB oracle equivalents. Notes:
  //  - DuckDB reads events.ts as TIMESTAMP_NS; epoch_us(CAST(ts AS
  //    TIMESTAMP)) truncates to micros exactly like our `ts DIV 1000`.
  //  - DuckDB CAST(double AS BIGINT) rounds while Spark truncates, hence
  //    trunc() in q05.
  //  - window/date/length functions return BIGINT in DuckDB but INT in
  //    Spark → explicit INTEGER casts keep schemas aligned.
  def oracleSql: Map[String, String] = ListMap(
    "q01_filter_project" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey",
    "q02_mask_sha256" ->
      "SELECT c_custkey, sha256(c_name) AS masked FROM customer ORDER BY c_custkey",
    "q03_latest_state" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |       value AS last_value, ts_us AS last_ts_us
        |FROM ranked WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "q04_delete_propagation" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events),
        |latest AS (SELECT user_id, event_id AS last_event_id,
        |                  event_type AS last_event_type FROM ranked WHERE rn = 1)
        |SELECT user_id, last_event_id, last_event_type FROM latest
        |WHERE NOT EXISTS (SELECT 1 FROM events e
        |                  WHERE e.user_id = latest.user_id
        |                    AND e.event_type = 'error' AND e.event_id % 100 < 15)
        |ORDER BY user_id""".stripMargin,
    "q05_type_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(trunc(l_quantity) AS BIGINT) AS qty_big,
        |  CAST(l_extendedprice AS DECIMAL(18,2)) AS price_dec,
        |  CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q06_max_progress" ->
      """SELECT user_id, MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_ts_us,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q07_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q08_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q08b_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q09_join_multiway" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q10_join_broadcast" ->
      """SELECT r_name, n_name, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q11_agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
        |       (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q12_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders FROM orders",
    "q13_rollup" ->
      """SELECT n_name, o_orderpriority,
        |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderpriority)
        |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q14_having_subquery" ->
      """WITH t AS (SELECT c_nationkey, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tb
        |           FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, CAST(tb AS DOUBLE) AS total_bal FROM t
        |WHERE CAST(tb AS DOUBLE) > (SELECT CAST(SUM(tb) AS DOUBLE) / COUNT(*) FROM t)
        |ORDER BY c_nationkey""".stripMargin,
    "q15_window_rank" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
        |  FROM customer) x
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,
    "q16_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum_10
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q17_time_bucket" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q19_setops" ->
      """SELECT tag, c_custkey FROM (
        |  SELECT 'both' AS tag, c_custkey FROM (
        |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |    INTERSECT
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  UNION ALL
        |  SELECT 'only_a' AS tag, c_custkey FROM (
        |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |    EXCEPT
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |) ORDER BY tag, c_custkey""".stripMargin,
    "q20_scalar" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  substr(o_orderpriority, 1, 1) AS pri1,
        |  lower(substr(o_orderpriority, 3, 20)) AS pri_word,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
        |  CAST(length(o_orderpriority) AS INTEGER) AS pri_len,
        |  o_orderkey % 97 AS mod97
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q21_array_json" ->
      """WITH agg AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust,
        |         list(c_custkey ORDER BY c_custkey) AS cust_keys
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, n_cust, cust_keys,
        |  to_json(struct_pack(n_nationkey := n_nationkey, n_cust := n_cust)) AS j,
        |  n_name AS map_val
        |FROM agg JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_nationkey""".stripMargin,
  )
}
