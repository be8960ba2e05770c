package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated corpus (see /root/repo/TESTDATA.md).
  *
  * One quirk: `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS),
  * which Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We read
  * it via `spark.sql.legacy.parquet.nanosAsLong` as raw nanos and expose a
  * derived `ts_us` (epoch micros, BIGINT) that all event queries use. At
  * 100 TB the integer-nanos representation is actually preferable: int64
  * min/max pushdown still works and no timezone conversion sits in the
  * scan hot path.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, name))
  }

  /** events with `ts_us`: epoch microseconds as BIGINT (truncating nanos,
    * matching DuckDB's CAST(ts AS TIMESTAMP) → epoch_us semantics). */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").withColumn("ts_us", expr("ts DIV 1000"))

  /** Width-normalized scan for expensive per-row work (shingling, explode,
    * decimal vector math): a small corpus arrives as ONE parquet split and
    * would otherwise run that work on a single core. Hash-repartitioning on
    * the key parallelizes it; at 100 TB the scan already has ≥ this many
    * splits and AQE coalesces the pass-through exchange away. */
  def spread(spark: SparkSession, dir: String, name: String,
      key: String): DataFrame =
    table(spark, dir, name)
      .repartition(spark.sparkContext.defaultParallelism, col(key))
}
