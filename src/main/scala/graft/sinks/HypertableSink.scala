package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Time-bucket-partitioned append sink — the TimescaleDB hypertable analog
  * (reference `src/sinks/timescaledb.py:89-139` creates hypertables
  * chunked on a time column with compression; SURVEY §2.1 maps that to
  * `partitionBy(time_bucket)` on a columnar sink).
  *
  * Scale properties this layout buys at 100 TB:
  *  - time-range queries prune whole directories (PartitionFilters, no
  *    file listing outside the range) — the hypertable chunk-exclusion
  *    analog;
  *  - ZSTD-compressed parquet within each bucket is the compression-policy
  *    analog (`timescaledb.py:120-139`);
  *  - append-only micro-batches never rewrite old buckets, so concurrent
  *    readers see immutable history.
  */
object HypertableSink {

  /** Partition-label format per supported granularity. The label must
    * carry exactly the truncation's resolution: a coarser format would
    * silently collapse distinct buckets into one partition value (a
    * "minute" request rendered at hour resolution IS an hourly layout),
    * a finer one would be all-zeros noise. */
  private val LabelFormats = Map(
    "week" -> "yyyy-MM-dd", "day" -> "yyyy-MM-dd",
    "hour" -> "yyyy-MM-dd'T'HH", "minute" -> "yyyy-MM-dd'T'HH:mm")

  /** Derive the bucket column. `granularity` ∈ week/day/hour/minute;
    * micros-typed time columns should be passed through
    * `timestamp_micros` first by the caller. */
  def bucketCol(timeCol: String, granularity: String) = {
    val fmt = LabelFormats.getOrElse(granularity,
      throw new IllegalArgumentException(
        s"unsupported hypertable granularity '$granularity' " +
          s"(supported: ${LabelFormats.keys.mkString(", ")})"))
    date_format(date_trunc(granularity, col(timeCol)), fmt).as("time_bucket")
  }

  /** Batch append, one directory per time bucket. */
  def write(df: DataFrame, path: String, timeCol: String,
      granularity: String = "day"): Unit =
    df.withColumn("time_bucket", bucketCol(timeCol, granularity))
      .write.mode("append")
      .partitionBy("time_bucket")
      .option("compression", "zstd")
      .parquet(path)

  /** Streaming append with checkpointed exactly-once file commits. */
  def writeStream(df: DataFrame, path: String, checkpointDir: String,
      timeCol: String, granularity: String = "day"): StreamingQuery =
    df.withColumn("time_bucket", bucketCol(timeCol, granularity))
      .writeStream.format("parquet")
      .partitionBy("time_bucket")
      .option("path", path)
      .option("compression", "zstd")
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Read back; time predicates on `time_bucket` become partition filters
    * (directory pruning), predicates on `timeCol` prune row groups via
    * parquet min/max within the surviving buckets.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** True iff `df`'s scan prunes partitions (its plan carries a
    * non-empty PartitionFilters list). */
  def prunesPartitions(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(time_bucket")
}
