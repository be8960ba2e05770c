package graft

import java.nio.file.Files
import graft.sinks.DlqSink

/** DLQ format + retrieval semantics (`tests/unit/test_dlq.py:16-213`). */
class DlqSpec extends SparkSpec {
  import spark.implicits._

  test("write/read/count round-trip, partitioned by destination and date") {
    val dir = Files.createTempDirectory("dlq").toString
    val failed = Seq(("e1", "users"), ("e2", "users")).toDF("event_id", "table_name")
    DlqSink.write(failed, dir, "postgres", "SchemaError", "boom",
      failedAtMicros = 1704067200000000L) // 2024-01-01
    DlqSink.write(failed.limit(1), dir, "clickhouse", "Timeout", "slow",
      failedAtMicros = 1704067200000000L)

    assert(DlqSink.count(spark, dir, "postgres") == 2)
    assert(DlqSink.count(spark, dir, "clickhouse") == 1)
    val row = DlqSink.read(spark, dir, "postgres").head()
    assert(row.getAs[String]("error_type") == "SchemaError")
    // partition-column inference reads the date partition back as DateType
    assert(row.getAs[Any]("failed_date").toString == "2024-01-01")
    // append mode accumulates (writer.py append semantics)
    DlqSink.write(failed, dir, "postgres", "SchemaError", "boom2",
      failedAtMicros = 1704153600000000L) // next day
    assert(DlqSink.count(spark, dir, "postgres") == 4)
  }

  test("spec-extra fields round-trip (data-model.md:233-244)") {
    val dir = Files.createTempDirectory("dlq2").toString
    val failed = Seq(("e1", "users")).toDF("event_id", "table_name")
    DlqSink.write(failed, dir, "postgres", "ConnectionError", "refused",
      failedAtMicros = 1704153600000000L,
      retryCount = 5, firstFailureAtMicros = 1704153000000000L,
      stackTrace = "java.net.ConnectException: refused\n  at Sink.write")
    val row = DlqSink.read(spark, dir, "postgres").head()
    assert(row.getAs[Long]("retry_count") == 5L)
    assert(row.getAs[Long]("first_failure_at_micros") == 1704153000000000L)
    assert(row.getAs[String]("stack_trace").startsWith("java.net.ConnectException"))
    assert(row.getAs[String]("dlq_id").length == 36) // uuid
    // first_failure_at defaults to the failure time when not supplied
    DlqSink.write(failed, dir, "clickhouse", "Timeout", "slow",
      failedAtMicros = 1704153600000000L)
    val row2 = DlqSink.read(spark, dir, "clickhouse").head()
    assert(row2.getAs[Long]("first_failure_at_micros") == 1704153600000000L)
    assert(row2.getAs[Long]("retry_count") == 0L)
  }

  test("FanOut threads retry outcome into the DLQ record") {
    val dir = Files.createTempDirectory("dlq3").toString
    val batch = Seq(("e1", "users")).toDF("event_id", "table_name")
    val dead = graft.streaming.FanOut.Destination("broken",
      graft.sinks.RetryPolicy(maxAttempts = 3, baseDelayMs = 1),
      (_, _) => throw new java.net.ConnectException("connection refused"))
    val results = graft.streaming.FanOut.writeAll(batch, 7L, Seq(dead), dir)
    assert(results.head.dlqRows == 1)
    val row = DlqSink.read(spark, dir, "broken").head()
    assert(row.getAs[Long]("retry_count") == 3L) // exhausted after 3 attempts
    assert(row.getAs[String]("error_type") == "ConnectException")
    assert(row.getAs[String]("stack_trace").contains("ConnectException"))
    assert(row.getAs[Long]("first_failure_at_micros") <=
      row.getAs[Long]("failed_at_micros"))
    assert(row.getAs[Long]("batch_id") == 7L)
  }

  test("replay re-delivers dead letters and compacts the queue") {
    val dir = Files.createTempDirectory("dlq4").toString
    val out = Files.createTempDirectory("dlq4out").toString
    val batch = Seq(("e1", "users"), ("e2", "users")).toDF("event_id", "table_name")
    // destination down -> both batches dead-letter
    val flaky = new java.util.concurrent.atomic.AtomicBoolean(true)
    def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      if (flaky.get()) throw new java.net.ConnectException("still down")
      df.write.mode("overwrite").parquet(s"$out/batch=$batchId")
    }
    val dest = graft.streaming.FanOut.Destination("pg",
      graft.sinks.RetryPolicy(maxAttempts = 2, baseDelayMs = 1), write)
    graft.streaming.FanOut.writeAll(batch, 1L, Seq(dest), dir)
    graft.streaming.FanOut.writeAll(batch.limit(1), 2L, Seq(dest), dir)
    assert(DlqSink.count(spark, dir, "pg") == 3)

    // replay while STILL down: letters stay queued, result reports failure
    val down = DlqSink.replay(spark, dir, "pg", replayBatchId = 100L,
      write, graft.sinks.RetryPolicy(maxAttempts = 2, baseDelayMs = 1))
    assert(!down.succeeded && down.rows == 3)
    assert(DlqSink.count(spark, dir, "pg") == 3)

    // destination heals: replay delivers payload columns only, queue empties
    flaky.set(false)
    val up = DlqSink.replay(spark, dir, "pg", replayBatchId = 101L,
      write, graft.sinks.RetryPolicy(maxAttempts = 2, baseDelayMs = 1))
    assert(up.succeeded && up.rows == 3)
    assert(DlqSink.count(spark, dir, "pg") == 0)
    val delivered = spark.read.parquet(s"$out/batch=101")
    assert(delivered.count() == 3)
    assert(delivered.columns.sorted.toSeq == Seq("event_id", "table_name"))
  }

  test("preserveBatchIds replay re-drives each group under its original batch_id") {
    val dir = Files.createTempDirectory("dlq5").toString
    val out = Files.createTempDirectory("dlq5out").toString
    val batch = Seq(("e1", "users"), ("e2", "users")).toDF("event_id", "table_name")
    val flaky = new java.util.concurrent.atomic.AtomicBoolean(true)
    def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      if (flaky.get()) throw new java.net.ConnectException("still down")
      // overwrite per batchId = the batchId-idempotent destination shape;
      // a replay reusing the ORIGINAL id lands on the same path a late
      // success from an abandoned timeout attempt already wrote
      df.write.mode("overwrite").parquet(s"$out/batch=$batchId")
    }
    val dest = graft.streaming.FanOut.Destination("pg",
      graft.sinks.RetryPolicy(maxAttempts = 2, baseDelayMs = 1), write)
    graft.streaming.FanOut.writeAll(batch, 7L, Seq(dest), dir)
    graft.streaming.FanOut.writeAll(batch.limit(1), 8L, Seq(dest), dir)
    assert(DlqSink.count(spark, dir, "pg") == 3)

    flaky.set(false)
    val up = DlqSink.replay(spark, dir, "pg", replayBatchId = 999L,
      write, graft.sinks.RetryPolicy(maxAttempts = 2, baseDelayMs = 1),
      preserveBatchIds = true)
    assert(up.succeeded && up.rows == 3)
    assert(DlqSink.count(spark, dir, "pg") == 0)
    // delivered under the ORIGINAL ids — never under the replay id
    assert(spark.read.parquet(s"$out/batch=7").count() == 2)
    assert(spark.read.parquet(s"$out/batch=8").count() == 1)
    assert(!new java.io.File(s"$out/batch=999").exists())
  }

  test("preserveBatchIds degrades gracefully when letters carry no batch_id") {
    val dir = Files.createTempDirectory("dlq6").toString
    val out = Files.createTempDirectory("dlq6out").toString
    // foreign producer: dead-letters written WITHOUT a batch_id column
    val failed = Seq(("e1", "users"), ("e2", "users")).toDF("event_id", "table_name")
    DlqSink.write(failed, dir, "pg", "Timeout", "slow",
      failedAtMicros = 1704067200000000L)
    def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      df.write.mode("overwrite").parquet(s"$out/batch=$batchId")
    val up = DlqSink.replay(spark, dir, "pg", replayBatchId = 77L,
      write, graft.sinks.RetryPolicy(maxAttempts = 2, baseDelayMs = 1),
      preserveBatchIds = true)
    assert(up.succeeded && up.rows == 2)
    // no batch_id column at all -> one write under the replay id
    assert(spark.read.parquet(s"$out/batch=77").count() == 2)
  }

  test("preserveBatchIds degrades gracefully when batch_id is non-integral") {
    val dir = Files.createTempDirectory("dlq6s").toString
    val out = Files.createTempDirectory("dlq6sout").toString
    // foreign producer whose batch_id JSONL-round-trips as a STRING — the
    // replay must fall back to the single replayBatchId write, not throw
    // ClassCastException on getLong
    val failed = Seq(("e1", "users", "b-7"), ("e2", "users", "b-8"))
      .toDF("event_id", "table_name", "batch_id")
    DlqSink.write(failed, dir, "pg", "Timeout", "slow",
      failedAtMicros = 1704067200000000L)
    def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      df.write.mode("overwrite").parquet(s"$out/batch=$batchId")
    val up = DlqSink.replay(spark, dir, "pg", replayBatchId = 88L,
      write, graft.sinks.RetryPolicy(maxAttempts = 2, baseDelayMs = 1),
      preserveBatchIds = true)
    assert(up.succeeded && up.rows == 2)
    assert(spark.read.parquet(s"$out/batch=88").count() == 2)
  }

  test("letters appended during a replay survive its compaction") {
    val dir = Files.createTempDirectory("dlq5").toString
    val batch = Seq(("e1", "users")).toDF("event_id", "table_name")
    DlqSink.write(batch, dir, "pg", "Timeout", "slow",
      failedAtMicros = 1704067200000000L)
    // the destination write itself dead-letters a NEW failure mid-replay
    // (stands in for a concurrent streaming batch failing while the
    // replay is in flight)
    def write(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      DlqSink.write(batch, dir, "pg", "Timeout", "concurrent",
        failedAtMicros = 1704067260000000L)
      df.count(); ()
    }
    val res = DlqSink.replay(spark, dir, "pg", replayBatchId = 200L, write)
    assert(res.succeeded && res.rows == 1)
    // compaction removed only the replayed files; the mid-flight letter stays
    val remaining = DlqSink.read(spark, dir, "pg")
    assert(remaining.count() == 1)
    assert(remaining.head().getAs[String]("error_message") == "concurrent")
  }
}
