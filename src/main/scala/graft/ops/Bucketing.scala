package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Bucketed-table layout for shuffle-free ("co-located") joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
  * sides. Writing the tables bucketed by the join key (same bucket count,
  * sorted within buckets) makes every subsequent join/aggregation on that
  * key a zero-Exchange sort-merge join: each task reads bucket i of both
  * sides locally. The reference delegates this to its warehouses' physical
  * layout (ClickHouse ORDER BY key, Postgres indexes —
  * scripts/setup-local-env.sh:107-110, 184-186); in Spark the equivalent
  * lever is `bucketBy` + the catalog.
  *
  * BucketingSpec proves the no-Exchange plan and result parity with the
  * unbucketed join.
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed + sorted by `key`.
    * Bucket count is a layout decision: pick so one bucket of the LARGER
    * table ≈ 128–512 MB at target scale (e.g. 100 TB / 256 MB ≈ 400k — at
    * our test scale a handful suffices; the mechanism is identical).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Equi-join of two co-bucketed catalog tables on `key`. With both sides
    * bucketed by `key` Spark plans SortMergeJoin with NO ShuffleExchange
    * (and, because buckets are sorted, no Sort either).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True iff the executed plan moved no data: no shuffle exchange node.
    * Walks the actual plan tree (unwrapping AQE) rather than matching plan
    * text — shuffle nodes print as "Exchange", so a string match on
    * "ShuffleExchange" would never fire and the check would be vacuous.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan).collectWithSubqueries {
      case e: ShuffleExchangeLike => e
    }.isEmpty
  }
}
