package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dead-letter queue as partitioned JSON-lines.
  *
  * Mirrors `src/dlq/writer.py:39-129`: failed events are appended as JSONL
  * with destination + error metadata and a failure date; files are
  * discoverable and countable per destination. Instead of the reference's
  * one-file-per-day naming (`dlq_{dest}_{date}.jsonl`, `writer.py:73-76`)
  * we partition by `destination`/`failed_date` directories — the same
  * retrieval semantics, but written in parallel by many executors and
  * partition-pruned on read at any scale.
  */
object DlqSink {

  /** Append failed rows. `df` is any DataFrame of failed events; error
    * context is attached as columns (spec `data-model.md:233-244`):
    * `dlq_id`, `error_type/_message`, `stack_trace`, `retry_count`,
    * `first_failure_at_micros`, and `failed_at_micros` (= dlq_written_at). */
  def write(df: DataFrame, dlqDir: String, destination: String,
      errorType: String, errorMessage: String, failedAtMicros: Long,
      retryCount: Int = 0, firstFailureAtMicros: Long = 0L,
      stackTrace: String = ""): Unit = {
    df.withColumn("dlq_id", expr("uuid()"))
      .withColumn("destination", lit(destination))
      .withColumn("error_type", lit(errorType))
      .withColumn("error_message", lit(errorMessage))
      .withColumn("stack_trace", lit(stackTrace))
      .withColumn("retry_count", lit(retryCount))
      .withColumn("first_failure_at_micros",
        lit(if (firstFailureAtMicros > 0) firstFailureAtMicros else failedAtMicros))
      .withColumn("failed_at_micros", lit(failedAtMicros))
      .withColumn("failed_date",
        date_format(timestamp_micros(lit(failedAtMicros)), "yyyy-MM-dd"))
      .write.mode("append")
      .partitionBy("destination", "failed_date")
      .json(dlqDir)
  }

  /** All DLQ rows for one destination (partition-pruned scan). */
  def read(spark: SparkSession, dlqDir: String, destination: String): DataFrame =
    spark.read.json(dlqDir).filter(col("destination") === destination)

  /** Count per destination (`writer.py:113-129`). */
  def count(spark: SparkSession, dlqDir: String, destination: String): Long =
    read(spark, dlqDir, destination).count()
}
