package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.sinks.{AppendVersionedSink, DlqSink, Retry, RetryPolicy}
import graft.streaming.{FanOut, UpsertStateStore}

/** Multi-destination fan-out: healthy sinks land the batch, a flaky sink
  * recovers via retry, a permanently broken sink goes to its DLQ partition
  * — and none of them affect each other (reference main.py:123-155).
  */
class FanOutSpec extends SparkSpec {
  import spark.implicits._

  test("versioned-sink compaction rewrites to the dedup view; appends keep working") {
    val tmp = Files.createTempDirectory("graft-compact")
    val sink = new AppendVersionedSink(s"$tmp/t", Seq("user_id"),
      "timestamp_micros")
    sink.append(Seq(("u1", "INSERT", 100L), ("u2", "INSERT", 110L))
      .toDF("user_id", "event_type", "timestamp_micros"), batchId = 1L)
    sink.append(Seq(("u1", "UPDATE", 200L), ("u2", "DELETE", 300L))
      .toDF("user_id", "event_type", "timestamp_micros"), batchId = 2L)
    val before = sink.view(spark).collect()

    sink.compact(spark)
    // storage collapsed to live keys only; the view is unchanged
    assert(sink.raw(spark).count() == 1) // u1 latest; u2 tombstoned away
    assert(sink.view(spark).collect().toSeq == before.toSeq)
    // post-compaction appends still merge correctly
    sink.append(Seq(("u1", "UPDATE", 400L))
      .toDF("user_id", "event_type", "timestamp_micros"), batchId = 3L)
    val after = sink.view(spark)
    assert(after.count() == 1)
    assert(after.head().getLong(2) == 400L)
  }

  test("per-destination isolation: healthy + flaky succeed, broken goes to DLQ") {
    val tmp = Files.createTempDirectory("graft-fanout")
    val dlqDir = s"$tmp/dlq"
    val store = new UpsertStateStore(s"$tmp/state", Seq("user_id"),
      Seq("timestamp_micros"))
    val versioned = new AppendVersionedSink(s"$tmp/versioned", Seq("user_id"),
      "timestamp_micros")
    // flaky gets its OWN directory: concurrent appends into one parquet
    // path share the _temporary staging dir and corrupt each other (see
    // FanOut scaladoc — destinations must not share output paths)
    val flakySink = new AppendVersionedSink(s"$tmp/flaky", Seq("user_id"),
      "timestamp_micros")

    val batch = Seq(
      ("u1", "INSERT", 100L), ("u2", "INSERT", 110L), ("u1", "UPDATE", 120L))
      .toDF("user_id", "event_type", "timestamp_micros")

    val flakyCalls = new AtomicInteger(0)
    val fastRetry = RetryPolicy(maxAttempts = 3, baseDelayMs = 1, maxDelayMs = 2)
    val results = FanOut.writeAll(batch, batchId = 7L, dests = Seq(
      FanOut.Destination("state-store", fastRetry, store.upsert),
      FanOut.Destination("versioned", fastRetry, versioned.append),
      FanOut.Destination("flaky", fastRetry, (df, id) => {
        if (flakyCalls.incrementAndGet() < 3)
          throw new java.net.ConnectException("connection refused")
        flakySink.append(df, id)
      }),
      FanOut.Destination("broken", fastRetry,
        (_, _) => throw new IllegalStateException("schema mismatch"))),
      dlqDir)

    val byName = results.map(r => r.destination -> r).toMap
    assert(byName("state-store").outcome == Retry.Succeeded((), 1))
    assert(byName("versioned").outcome == Retry.Succeeded((), 1))
    assert(byName("flaky").outcome == Retry.Succeeded((), 3)) // 2 failures + success
    assert(byName("broken").outcome.isInstanceOf[Retry.Permanent]) // no retry
    assert(byName("broken").dlqRows == 3)

    // healthy destinations hold the full batch result
    val state = store.current(spark).get
    assert(state.count() == 2) // u1 collapsed to latest, u2
    assert(state.filter($"user_id" === "u1").head().getLong(2) == 120L)
    assert(versioned.raw(spark).count() == 3)
    assert(flakySink.raw(spark).count() == 3) // landed on 3rd attempt

    // the broken destination's rows are all in ITS dlq partition, tagged
    val dlq = DlqSink.read(spark, dlqDir, "broken")
    assert(dlq.count() == 3)
    assert(DlqSink.count(spark, dlqDir, "state-store") == 0)
    assert(dlq.select("error_type").distinct().head().getString(0)
      == "IllegalStateException")
  }

  test("replay after partial failure re-writes only idempotently") {
    val tmp = Files.createTempDirectory("graft-fanout2")
    val store = new UpsertStateStore(s"$tmp/state", Seq("user_id"),
      Seq("timestamp_micros"))
    val batch = Seq(("u1", "INSERT", 1L)).toDF("user_id", "event_type",
      "timestamp_micros")
    val p = RetryPolicy(maxAttempts = 2, baseDelayMs = 1, maxDelayMs = 1)
    // first attempt: store succeeds
    FanOut.writeAll(batch, 1L, Seq(
      FanOut.Destination("state-store", p, store.upsert)), s"$tmp/dlq")
    // replay of the same batchId (as after a driver crash): the store's
    // _committed marker short-circuits — still exactly one row
    FanOut.writeAll(batch, 1L, Seq(
      FanOut.Destination("state-store", p, store.upsert)), s"$tmp/dlq")
    assert(store.current(spark).get.count() == 1)
    assert(store.committed(1L))
  }
}
