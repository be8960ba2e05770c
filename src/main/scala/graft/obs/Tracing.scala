package graft.obs

import java.io.PrintStream
import java.util.concurrent.ThreadLocalRandom
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

/** Distributed-tracing analog of the reference's OTel setup
  * (`src/observability/tracing.py:17-126`): `init` builds the tracer with
  * an optional console exporter behind a batch processor
  * (`tracing.py:36-55` `init_tracing`), `get` throws when uninitialized
  * (`tracing.py:58-69` `get_tracer`), and the two span factories carry the
  * reference's exact span names and attribute keys —
  * `replicate_event`{event.id, table.name, destination}
  * (`tracing.py:72-100`) and `batch_write`{batch.size, destination}
  * (`tracing.py:103-126`). When tracing was never initialized the
  * factories hand back a NON-RECORDING span, mirroring the reference's
  * `trace.get_current_span()` no-op fallback (`tracing.py:88-90`), so
  * instrumented call sites cost two branch instructions when tracing is
  * off.
  *
  * Scale note: spans are DRIVER-SIDE orchestration telemetry — one span
  * per micro-batch per destination, never per row. At 100 TB the span
  * volume tracks batch count (thousands/hour), not event count
  * (billions/hour); per-row spans would be the observability system
  * DDoS-ing itself, and the reference draws the same line (its spans wrap
  * `replicate_event`/`batch_write` units of work, `tracing.py:72,103`).
  * Executor-side work stays observable through the Spark UI/event log —
  * the tracer deliberately does not ship a serializable span context into
  * tasks.
  */
object Tracing {

  @volatile private var tracerOpt: Option[Tracer] = None

  /** `tracing.py:36-55`: build the provider, optionally attach
    * BatchSpanProcessor(ConsoleSpanExporter), install globally, return
    * the tracer. `extraExporters` is the OTLP-exporter slot the
    * reference defers to "Phase 5" — here it takes any [[SpanExporter]]
    * (specs plug a collecting one). */
  def init(serviceName: String = "cdc-pipeline",
      enableConsoleExport: Boolean = false,
      extraExporters: Seq[SpanExporter] = Nil,
      maxExportBatchSize: Int = 512,
      console: PrintStream = System.out): Tracer = synchronized {
    // flush + close any previous tracer first: a re-init must not drop
    // spans still buffered below its batch processors' maxBatch
    tracerOpt.foreach(_.shutdown())
    val exporters =
      (if (enableConsoleExport) Seq(new ConsoleSpanExporter(console)) else Nil) ++
        extraExporters
    val t = new Tracer(serviceName,
      exporters.map(e => new BatchSpanProcessor(e, maxExportBatchSize)))
    tracerOpt = Some(t)
    t
  }

  /** Config-driven init (`settings.py:118-119` `enable_tracing` /
    * `tracing_endpoint`): no-op when disabled. A `file://<path>`
    * endpoint selects the [[FileSpanExporter]] (spans land as a
    * queryable JSONL artifact at that path); any other endpoint — or
    * none — gets the console exporter rather than silently recording
    * spans into the void, matching the reference, whose OTLP "Phase 5"
    * slot never landed (`tracing.py:31-33`). The configured endpoint is
    * additionally surfaced on every span as a `tracing.endpoint`
    * resource attribute (the wiring an OTLP exporter would consume). */
  def initFromConfig(obs: graft.config.ObservabilitySettings): Option[Tracer] =
    if (!obs.enableTracing) None
    else {
      val fileExporter = obs.tracingEndpoint
        .filter(_.startsWith("file://"))
        .map(ep => new FileSpanExporter(
          java.nio.file.Paths.get(ep.stripPrefix("file://"))))
      val t = init(enableConsoleExport = fileExporter.isEmpty,
        extraExporters = fileExporter.toSeq)
      obs.tracingEndpoint.foreach(ep =>
        t.setResourceAttribute("tracing.endpoint", ep))
      Some(t)
    }

  /** `tracing.py:58-69`: the global tracer; RuntimeError when uninit. */
  def get: Tracer = tracerOpt.getOrElse(
    throw new IllegalStateException(
      "Tracing not initialized. Call Tracing.init() first."))

  /** Non-throwing access for optional instrumentation sites. */
  def active: Option[Tracer] = tracerOpt

  /** Flush + detach the global tracer (test isolation / shutdown). */
  def shutdown(): Unit = synchronized {
    tracerOpt.foreach(_.shutdown())
    tracerOpt = None
  }

  /** `tracing.py:72-100`: span for one replication event's processing.
    * Non-recording when tracing is off. Caller ends it. */
  def traceReplicationEvent(eventId: String, tableName: String,
      destination: String): Span =
    tracerOpt match {
      case Some(t) => t.startSpan("replicate_event",
        "event.id" -> eventId, "table.name" -> tableName,
        "destination" -> destination)
      case None => Span.NonRecording
    }

  /** `tracing.py:103-126`: span for one batch write. Caller ends it. */
  def traceBatchWrite(batchSize: Long, destination: String): Span =
    tracerOpt match {
      case Some(t) => t.startSpan("batch_write",
        "batch.size" -> batchSize, "destination" -> destination)
      case None => Span.NonRecording
    }

  private[obs] def randHex(bytes: Int): String = {
    val b = new Array[Byte](bytes)
    ThreadLocalRandom.current().nextBytes(b)
    b.map(x => f"${x & 0xff}%02x").mkString
  }
}

/** Immutable record of one finished span — what an exporter sees. */
final case class SpanData(
    traceId: String,
    spanId: String,
    parentSpanId: Option[String],
    name: String,
    serviceName: String,
    attributes: Seq[(String, Any)],
    startEpochNanos: Long,
    endEpochNanos: Long,
    status: String) // "OK" | "ERROR"

/** Exporter contract (the `SpanExporter` slot of `tracing.py:45-47`). */
trait SpanExporter {
  def export(batch: Seq[SpanData]): Unit
  def shutdown(): Unit = ()
}

/** One span as the OTel console-exporter JSON shape (name, context ids,
  * parent, times, status, attributes, resource.service.name) — shared
  * by the console and file exporters. */
private[obs] object SpanJson {
  def line(s: SpanData): String = {
    val m = HealthStatus.SharedMapper
    val root = m.createObjectNode()
    root.put("name", s.name)
    val ctx = root.putObject("context")
    ctx.put("trace_id", s.traceId)
    ctx.put("span_id", s.spanId)
    root.put("parent_id", s.parentSpanId.orNull)
    root.put("start_time_unix_nano", s.startEpochNanos)
    root.put("end_time_unix_nano", s.endEpochNanos)
    root.put("status", s.status)
    val at = root.putObject("attributes")
    s.attributes.foreach {
      case (k, v: Int) => at.put(k, v); ()
      case (k, v: Long) => at.put(k, v); ()
      case (k, v: Double) => at.put(k, v); ()
      case (k, v: Boolean) => at.put(k, v); ()
      case (k, v) => at.put(k, String.valueOf(v)); ()
    }
    root.putObject("resource").put("service.name", s.serviceName)
    m.writeValueAsString(root)
  }
}

/** One JSON line per span on the given stream — the dev-mode
  * `ConsoleSpanExporter` (`tracing.py:45`). */
final class ConsoleSpanExporter(out: PrintStream = System.out)
    extends SpanExporter {
  override def export(batch: Seq[SpanData]): Unit =
    batch.foreach(s => out.println(SpanJson.line(s)))
}

/** JSONL file exporter — the `file://` endpoint form of the reference's
  * deferred OTLP slot (`tracing.py:31-33,44-46`): span output becomes a
  * queryable on-disk artifact like the DLQ (`spark.read.json` over the
  * file), same line shape as the console exporter. Appends (a restarted
  * pipeline extends its trace log).
  *
  * Each span line goes down in ONE `write` on an O_APPEND channel — two
  * live tracers pointed at the same endpoint (a re-init without
  * shutdown, or two sessions sharing a config) then interleave only at
  * line boundaries, never mid-line, so the artifact `spark.read.json`
  * consumes stays parseable. (A shared buffered PrintStream per
  * exporter could flush partial lines from both writers interleaved.) */
final class FileSpanExporter(path: java.nio.file.Path)
    extends SpanExporter {
  Option(path.getParent)
    .foreach(p => java.nio.file.Files.createDirectories(p))
  private val ch = java.nio.channels.FileChannel.open(path,
    java.nio.file.StandardOpenOption.CREATE,
    java.nio.file.StandardOpenOption.WRITE,
    java.nio.file.StandardOpenOption.APPEND)
  override def export(batch: Seq[SpanData]): Unit = synchronized {
    batch.foreach { s =>
      val bytes = (SpanJson.line(s) + "\n").getBytes("UTF-8")
      // FileChannel.write may return short; drain the buffer so a span
      // line never splits across writes (the atomicity contract above)
      val buf = java.nio.ByteBuffer.wrap(bytes)
      while (buf.hasRemaining) ch.write(buf)
    }
  }
  override def shutdown(): Unit = synchronized { ch.close() }
}

/** Spec/metrics exporter: keeps every exported span in memory. */
final class CollectingSpanExporter extends SpanExporter {
  private val buf = mutable.ArrayBuffer.empty[SpanData]
  private var shut = false
  override def export(batch: Seq[SpanData]): Unit =
    synchronized { buf ++= batch }
  override def shutdown(): Unit = synchronized { shut = true }
  def spans: Seq[SpanData] = synchronized { buf.toSeq }
  def isShutdown: Boolean = synchronized { shut }
}

/** Buffers finished spans and hands them to the exporter in batches —
  * the `BatchSpanProcessor` of `tracing.py:46`. Flushes when the buffer
  * reaches `maxBatch` and on `forceFlush`/`shutdown`; synchronous by
  * design (driver-side dev exporter — batching here bounds exporter
  * calls, not I/O latency, and a background thread would buy nothing a
  * 100 ms trigger doesn't already amortize). */
final class BatchSpanProcessor(exporter: SpanExporter, maxBatch: Int = 512) {
  private val buf = mutable.ArrayBuffer.empty[SpanData]

  private[obs] def onEnd(s: SpanData): Unit = {
    val ready: Seq[SpanData] = synchronized {
      buf += s
      if (buf.length >= maxBatch) { val out = buf.toSeq; buf.clear(); out }
      else Nil
    }
    if (ready.nonEmpty) exporter.export(ready)
  }

  def forceFlush(): Unit = {
    val ready: Seq[SpanData] = synchronized {
      val out = buf.toSeq; buf.clear(); out
    }
    if (ready.nonEmpty) exporter.export(ready)
  }

  def shutdown(): Unit = { forceFlush(); exporter.shutdown() }

  private[obs] def pending: Int = synchronized(buf.length)
}

/** A live span. Thread-confined by construction (parented off the
  * creating thread's context stack); `end()` is idempotent. */
final class Span private[obs] (
    tracer: Option[Tracer],
    val name: String,
    parent: Option[Span],
    initial: Seq[(String, Any)],
    explicitStartEpochNanos: Option[Long] = None) {

  val traceId: String =
    parent.map(_.traceId).getOrElse(Tracing.randHex(16))
  val spanId: String = Tracing.randHex(8)

  // wall-clock anchor + monotonic duration: end >= start always holds,
  // and the duration is real even when the wall clock steps. A
  // retrospective span (work finished before the span was constructed,
  // e.g. a micro-batch reported by a progress event) passes an explicit
  // start so exported start/end nanos reflect the actual window instead
  // of a ~0ns blip at emission time.
  private val constructedEpochNanos = System.currentTimeMillis() * 1000000L
  private val startEpochNanos =
    explicitStartEpochNanos.getOrElse(constructedEpochNanos)
  private val startMono = System.nanoTime()
  private val attrs = mutable.ArrayBuffer.empty[(String, Any)]
  attrs ++= initial
  private var status = "OK"
  private val ended = new AtomicBoolean(false)

  /** False for the uninitialized-tracing fallback span
    * (`tracing.py:88-90`): attribute writes and `end()` are no-ops. */
  def recording: Boolean = tracer.isDefined

  def setAttribute(key: String, value: Any): Span = {
    if (recording) synchronized { attrs += key -> value }
    this
  }

  /** Mark ERROR and record the exception class/message, the
    * `span.record_exception` + `set_status(ERROR)` shape. */
  def recordError(t: Throwable): Span = {
    if (recording) synchronized {
      status = "ERROR"
      attrs += "error.type" -> t.getClass.getSimpleName
      attrs += "error.message" -> Option(t.getMessage).getOrElse("")
    }
    this
  }

  def end(): Unit =
    if (recording && ended.compareAndSet(false, true)) {
      val t = tracer.get
      t.emit(SpanData(traceId, spanId, parent.map(_.spanId), name,
        t.serviceName, synchronized(attrs.toSeq), startEpochNanos,
        constructedEpochNanos + (System.nanoTime() - startMono),
        synchronized(status)))
    }
}

object Span {
  /** The shared non-recording fallback (`tracing.py:88-90`). */
  val NonRecording: Span = new Span(None, "", None, Nil)
}

/** The tracer: span construction with thread-local parent context, plus
  * the scoped `span(...) { body }` form (the `with tracer
  * .start_as_current_span(...)` idiom the OTel API offers the
  * reference). */
final class Tracer private[obs] (
    val serviceName: String,
    processors: Seq[BatchSpanProcessor]) {

  private val current = new ThreadLocal[List[Span]] {
    override def initialValue(): List[Span] = Nil
  }

  /** Start a span parented to the calling thread's current span (if
    * any) WITHOUT making it current — OTel `start_span` semantics, the
    * form the reference's factories use (`tracing.py:92,119`). The span
    * may therefore be ended on a different thread (FanOut ends its
    * per-destination spans on the write pool). Caller must `end()` it. */
  def startSpan(name: String, attributes: (String, Any)*): Span =
    new Span(Some(this), name, current.get().headOption, attributes)

  /** Start a span whose work ALREADY happened — `startEpochNanos` is the
    * real start of the window (e.g. `now − batch duration` for a span
    * built from a streaming progress event), so exporter consumers
    * reading standard span timing see the true duration rather than a
    * ~0ns emission-time blip. End semantics are unchanged (monotonic,
    * anchored at construction). */
  def startSpanAt(name: String, startEpochNanos: Long,
      attributes: (String, Any)*): Span =
    new Span(Some(this), name, current.get().headOption, attributes,
      Some(startEpochNanos))

  /** Scoped span — `start_as_current_span`: makes the span current for
    * `body` (children parent to it), records a thrown exception as
    * ERROR, always ends the span, rethrows. */
  def span[A](name: String, attributes: (String, Any)*)(body: => A): A = {
    val s = startSpan(name, attributes: _*)
    current.set(s :: current.get())
    try body
    catch { case t: Throwable => s.recordError(t); throw t }
    finally {
      current.set(current.get() match {
        case head :: tail if head eq s => tail
        case other => other.filterNot(_ eq s)
      })
      s.end()
    }
  }

  // resource-level attributes stamped onto every exported span (the
  // OTLP-exporter wiring slot, e.g. `tracing.endpoint` from config)
  @volatile private var resource: List[(String, Any)] = Nil

  def setResourceAttribute(key: String, value: Any): Unit =
    synchronized { resource = resource :+ (key -> value) }

  private[obs] def emit(data: SpanData): Unit = {
    val d =
      if (resource.isEmpty) data
      else data.copy(attributes = data.attributes ++ resource)
    processors.foreach(_.onEnd(d))
  }

  def forceFlush(): Unit = processors.foreach(_.forceFlush())

  def shutdown(): Unit = processors.foreach(_.shutdown())
}
