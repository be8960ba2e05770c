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

  /** One destination: a name (DLQ partition key), a retry policy, a
    * batchId-idempotent write, and a wall-clock bound on the whole
    * retried write. `timeoutMs` guards against a destination that HANGS
    * rather than fails (half-open TCP, a driver with no socket timeout):
    * retries only isolate destinations that throw, and an unbounded
    * await on a hung one would stall every other destination's next
    * batch. On timeout the batch goes to this destination's DLQ and the
    * others proceed. A late success from the abandoned attempt commits
    * under THIS batchId — idempotence holds per batchId, not across ids,
    * so the later DLQ replay dedupes it only when driven with
    * `DlqSink.replay(..., preserveBatchIds = true)` (re-writes under the
    * original batch_id recorded in the letters); a replay under a fresh
    * replayBatchId double-delivers to append-style destinations. */
  final case class Destination(
      name: String,
      policy: RetryPolicy = RetryPolicy(),
      write: (DataFrame, Long) => Unit,
      timeoutMs: Long = Long.MaxValue)

  /** Outcome per destination for metrics/health bookkeeping;
    * `durationMs` covers the whole retried write (the sink-health latency
    * input, `src/models/destination_sink.py:67-72`). */
  final case class FanOutResult(destination: String,
      outcome: Retry.Outcome[Unit], dlqRows: Long, durationMs: Long = 0L)

  /** Write `batch` to every destination concurrently; isolate failures.
    * Returns per-destination outcomes (order of `dests`). */
  /** Timer for destination write timeouts — one daemon thread, shared. */
  private lazy val timeoutTimer = {
    val t = new java.util.concurrent.ScheduledThreadPoolExecutor(1, (r: Runnable) => {
      val th = new Thread(r, "fanout-timeout")
      th.setDaemon(true)
      th
    })
    t.setRemoveOnCancelPolicy(true)
    t
  }

  def writeAll(batch: DataFrame, batchId: Long, dests: Seq[Destination],
      dlqDir: String)(implicit ec: ExecutionContext = ExecutionContext.global)
      : Seq[FanOutResult] = {
    batch.persist()
    try {
      val futures = dests.map { d =>
        val t0 = System.currentTimeMillis()
        // one `batch_write` span per destination per batch (the
        // reference's tracing unit, `src/observability/tracing.py:103`);
        // non-recording — two branches — unless Tracing.init was called.
        // batch.size is not attributed here: counting the batch costs a
        // Spark job, and the caller that knows the count can set it.
        val span = graft.obs.Tracing.active
          .map(_.startSpan("batch_write",
            "destination" -> d.name, "batch.id" -> batchId))
          .getOrElse(graft.obs.Span.NonRecording)
        val attempt = Future(Retry.withRetry(d.policy)(d.write(batch, batchId)))
        // bound the whole retried write: a destination that HANGS (vs
        // fails) must not stall the other destinations' next batch
        val bounded: Future[Retry.Outcome[Unit]] =
          if (d.timeoutMs == Long.MaxValue) attempt
          else {
            val p = scala.concurrent.Promise[Retry.Outcome[Unit]]()
            val task = timeoutTimer.schedule(new Runnable {
              def run(): Unit = {
                p.trySuccess(Retry.Exhausted(
                  new java.util.concurrent.TimeoutException(
                    s"${d.name} write exceeded ${d.timeoutMs} ms"),
                  attempts = 1, firstFailureAtMillis = t0))
                ()
              }
            }, d.timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
            attempt.onComplete { r => task.cancel(false); p.tryComplete(r) }
            p.future
          }
        bounded.map { out =>
          val dlqRows = out match {
            case Retry.Succeeded(_, _) => 0L
            case Retry.Permanent(err, attempts, firstAt) =>
              span.recordError(err)
              toDlq(batch, batchId, d.name, err, dlqDir, attempts, firstAt)
            case Retry.Exhausted(err, attempts, firstAt) =>
              span.recordError(err)
              toDlq(batch, batchId, d.name, err, dlqDir, attempts, firstAt)
          }
          val attempts = out match {
            case Retry.Succeeded(_, a) => a
            case Retry.Permanent(_, a, _) => a
            case Retry.Exhausted(_, a, _) => a
          }
          span.setAttribute("retry.attempts", attempts)
            .setAttribute("dlq.rows", dlqRows)
            .end()
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
