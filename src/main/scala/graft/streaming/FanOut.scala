package graft.streaming

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sinks.{DlqSink, Retry, RetryPolicy}

/** Per-batch fan-out to N destinations with per-destination failure
  * isolation — the reference's core orchestration
  * (`src/main.py:123-155`: one batch, `asyncio.gather` across sinks,
  * `return_exceptions=True` so one sick destination never blocks the
  * others; retry + DLQ handoff per destination,
  * `specs/.../research.md:361-378`).
  *
  * Spark shape (SURVEY §2.9 fan-out note): ONE streaming query, the batch
  * `persist()`ed once, destination writes dispatched concurrently from the
  * driver. Each destination owns a retry policy (§2.9 backoff semantics);
  * permanent or exhausted failures append the whole batch to that
  * destination's DLQ partition and the other destinations proceed —
  * matching the reference's per-sink health independence. Exactly-once
  * stays per-destination: every sink write is `batchId`-idempotent, so a
  * replayed batch re-writes only destinations that failed.
  *
  * Constraint: destinations run CONCURRENTLY and therefore must not share
  * an output path — two simultaneous parquet appends into one directory
  * share the Hadoop committer's `_temporary` staging dir and corrupt each
  * other's commits. One destination = one sink = one path.
  */
object FanOut {

  /** One destination: a name (DLQ partition key), a retry policy, and a
    * batchId-idempotent write. */
  final case class Destination(
      name: String,
      policy: RetryPolicy = RetryPolicy(),
      write: (DataFrame, Long) => Unit)

  /** Outcome per destination for metrics/health bookkeeping;
    * `durationMs` covers the whole retried write (the sink-health latency
    * input, `src/models/destination_sink.py:67-72`). */
  final case class FanOutResult(destination: String,
      outcome: Retry.Outcome[Unit], dlqRows: Long, durationMs: Long = 0L)

  /** Write `batch` to every destination concurrently; isolate failures.
    * Returns per-destination outcomes (order of `dests`). */
  def writeAll(batch: DataFrame, batchId: Long, dests: Seq[Destination],
      dlqDir: String)(implicit ec: ExecutionContext = ExecutionContext.global)
      : Seq[FanOutResult] = {
    batch.persist()
    try {
      val futures = dests.map { d =>
        Future {
          val t0 = System.currentTimeMillis()
          val out = Retry.withRetry(d.policy)(d.write(batch, batchId))
          val dlqRows = out match {
            case Retry.Succeeded(_, _) => 0L
            case Retry.Permanent(err, attempts, firstAt) =>
              toDlq(batch, batchId, d.name, err, dlqDir, attempts, firstAt)
            case Retry.Exhausted(err, attempts, firstAt) =>
              toDlq(batch, batchId, d.name, err, dlqDir, attempts, firstAt)
          }
          FanOutResult(d.name, out, dlqRows,
            durationMs = System.currentTimeMillis() - t0)
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally { batch.unpersist(); () }
  }

  private def toDlq(batch: DataFrame, batchId: Long, dest: String,
      err: Throwable, dlqDir: String, attempts: Int,
      firstFailureAtMillis: Long): Long = {
    val n = batch.count()
    val sw = new java.io.StringWriter()
    err.printStackTrace(new java.io.PrintWriter(sw))
    DlqSink.write(
      batch.withColumn("batch_id", lit(batchId)),
      dlqDir, destination = dest,
      errorType = err.getClass.getSimpleName,
      errorMessage = Option(err.getMessage).getOrElse(""),
      failedAtMicros = System.currentTimeMillis() * 1000,
      retryCount = attempts,
      firstFailureAtMicros = firstFailureAtMillis * 1000,
      stackTrace = sw.toString)
    n
  }
}
