package graft

import java.io.{ByteArrayOutputStream, PrintStream}

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.obs._

/** Tracing analog of the reference's OTel setup
  * (`src/observability/tracing.py`): init/get lifecycle, the two span
  * factories' names + attribute keys, the uninitialized no-op fallback,
  * batch-processor flush behavior, console JSON shape, scoped
  * parent/child context, and the FanOut `batch_write` wiring.
  */
class TracingSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterEach {

  override def beforeEach(): Unit = Tracing.shutdown()
  override def afterEach(): Unit = Tracing.shutdown()

  test("get before init throws; init installs; shutdown detaches (tracing.py:58-69)") {
    val e = intercept[IllegalStateException](Tracing.get)
    assert(e.getMessage.contains("not initialized"))
    val t = Tracing.init(serviceName = "svc-a")
    assert(Tracing.get eq t)
    Tracing.shutdown()
    intercept[IllegalStateException](Tracing.get)
  }

  test("uninitialized factories return non-recording spans (tracing.py:88-90)") {
    val s = Tracing.traceReplicationEvent("e1", "users", "postgres")
    assert(!s.recording)
    // all operations are harmless no-ops
    s.setAttribute("k", "v").recordError(new RuntimeException("x")).end()
    val b = Tracing.traceBatchWrite(10, "clickhouse")
    assert(!b.recording)
    b.end()
  }

  test("trace_replication_event carries the reference's span name and attribute keys") {
    val col = new CollectingSpanExporter
    Tracing.init(extraExporters = Seq(col), maxExportBatchSize = 1)
    val s = Tracing.traceReplicationEvent("ev-42", "orders", "timescaledb")
    assert(s.recording)
    s.end()
    val d = col.spans.head
    assert(d.name == "replicate_event")
    assert(d.attributes.toMap == Map(
      "event.id" -> "ev-42", "table.name" -> "orders",
      "destination" -> "timescaledb"))
    assert(d.parentSpanId.isEmpty)
    assert(d.status == "OK")
    assert(d.endEpochNanos >= d.startEpochNanos)
  }

  test("trace_batch_write carries batch.size + destination (tracing.py:103-126)") {
    val col = new CollectingSpanExporter
    Tracing.init(extraExporters = Seq(col), maxExportBatchSize = 1)
    Tracing.traceBatchWrite(500, "postgres").end()
    val d = col.spans.head
    assert(d.name == "batch_write")
    assert(d.attributes.toMap == Map(
      "batch.size" -> 500L, "destination" -> "postgres"))
  }

  test("scoped spans nest: child shares trace id, parents to the enclosing span") {
    val col = new CollectingSpanExporter
    val t = Tracing.init(extraExporters = Seq(col), maxExportBatchSize = 1)
    t.span("outer", "a" -> 1) {
      t.span("inner") { 42 }
    }
    val byName = col.spans.map(d => d.name -> d).toMap
    val outer = byName("outer")
    val inner = byName("inner")
    assert(inner.traceId == outer.traceId)
    assert(inner.parentSpanId.contains(outer.spanId))
    assert(outer.parentSpanId.isEmpty)
    // after the scope closes, new spans are roots again
    t.span("after") { () }
    assert(col.spans.find(_.name == "after").get.parentSpanId.isEmpty)
  }

  test("scoped span records a thrown exception as ERROR and rethrows") {
    val col = new CollectingSpanExporter
    val t = Tracing.init(extraExporters = Seq(col), maxExportBatchSize = 1)
    val boom = intercept[RuntimeException] {
      t.span("failing")(throw new RuntimeException("disk on fire"))
    }
    assert(boom.getMessage == "disk on fire")
    val d = col.spans.head
    assert(d.status == "ERROR")
    val m = d.attributes.toMap
    assert(m("error.type") == "RuntimeException")
    assert(m("error.message") == "disk on fire")
  }

  test("batch processor buffers to maxBatch, flushes on shutdown, end() is idempotent") {
    val col = new CollectingSpanExporter
    val t = Tracing.init(extraExporters = Seq(col), maxExportBatchSize = 3)
    val s1 = t.startSpan("s1"); s1.end(); s1.end() // double end: one export
    t.startSpan("s2").end()
    assert(col.spans.isEmpty) // buffered: 2 < 3
    t.startSpan("s3").end()
    assert(col.spans.map(_.name) == Seq("s1", "s2", "s3")) // batch flushed
    t.startSpan("s4").end()
    assert(col.spans.length == 3) // s4 buffered
    Tracing.shutdown() // force-flush + exporter shutdown
    assert(col.spans.map(_.name) == Seq("s1", "s2", "s3", "s4"))
    assert(col.isShutdown)
  }

  test("startSpanAt backdates the exported start: standard span timing " +
      "covers the retrospective window, not a ~0ns emission blip") {
    val col = new CollectingSpanExporter
    val t = Tracing.init(extraExporters = Seq(col), maxExportBatchSize = 1)
    val windowNanos = 250L * 1000000L // a 250 ms batch reported after the fact
    val start = System.currentTimeMillis() * 1000000L - windowNanos
    t.startSpanAt("micro_batch", start, "duration.ms" -> 250L).end()
    val d = col.spans.head
    assert(d.startEpochNanos == start)
    // end stays emission-anchored (monotonic), so the exported duration
    // is at least the backdated window
    assert(d.endEpochNanos - d.startEpochNanos >= windowNanos)
  }

  test("console exporter emits one parseable JSON line per span, OTel field shape") {
    val bytes = new ByteArrayOutputStream()
    Tracing.init(serviceName = "cdc-pipeline", enableConsoleExport = true,
      maxExportBatchSize = 1, console = new PrintStream(bytes, true, "UTF-8"))
    Tracing.traceBatchWrite(7, "clickhouse").end()
    val lines = bytes.toString("UTF-8").split("\n").filter(_.nonEmpty)
    assert(lines.length == 1)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(lines(0))
    assert(root.get("name").asText == "batch_write")
    assert(root.get("context").get("trace_id").asText.length == 32)
    assert(root.get("context").get("span_id").asText.length == 16)
    assert(root.get("status").asText == "OK")
    assert(root.get("attributes").get("batch.size").asLong == 7L)
    assert(root.get("attributes").get("destination").asText == "clickhouse")
    assert(root.get("resource").get("service.name").asText == "cdc-pipeline")
    assert(root.get("end_time_unix_nano").asLong >= root.get("start_time_unix_nano").asLong)
  }

  test("FanOut emits one batch_write span per destination; failure records ERROR + dlq rows") {
    import graft.sinks.RetryPolicy
    import graft.streaming.FanOut
    val col = new CollectingSpanExporter
    Tracing.init(extraExporters = Seq(col), maxExportBatchSize = 1)
    import spark.implicits._
    val batch = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val tmp = java.nio.file.Files.createTempDirectory("tracing-fanout").toString
    val dests = Seq(
      FanOut.Destination("good", RetryPolicy(maxAttempts = 1),
        (df, bid) => df.write.mode("overwrite").parquet(s"$tmp/good/b$bid")),
      FanOut.Destination("bad", RetryPolicy(maxAttempts = 2, baseDelayMs = 1),
        (_, _) => throw new RuntimeException("permanently broken")))
    FanOut.writeAll(batch, 7L, dests, s"$tmp/dlq")
    Tracing.get.forceFlush()
    val spans = col.spans.filter(_.name == "batch_write")
    assert(spans.length == 2)
    val byDest: Map[Any, SpanData] =
      spans.map(s => s.attributes.toMap.apply("destination") -> s).toMap
    val good = byDest("good").attributes.toMap
    val bad = byDest("bad").attributes.toMap
    assert(byDest("good").status == "OK")
    assert(good("batch.id") == 7L)
    assert(good("dlq.rows") == 0L)
    assert(byDest("bad").status == "ERROR")
    assert(bad("error.message") == "permanently broken")
    assert(bad("dlq.rows") == 3L)
  }

  test("resource attributes ride every span; re-init flushes the old tracer") {
    val col1 = new CollectingSpanExporter
    val t1 = Tracing.init(extraExporters = Seq(col1), maxExportBatchSize = 100)
    t1.setResourceAttribute("tracing.endpoint", "http://collector:4317")
    t1.startSpan("s").end()
    assert(col1.spans.isEmpty) // buffered below maxBatch
    val col2 = new CollectingSpanExporter
    Tracing.init(extraExporters = Seq(col2)) // re-init must flush + close t1
    assert(col1.spans.map(_.name) == Seq("s"))
    assert(col1.spans.head.attributes.toMap
      .apply("tracing.endpoint") == "http://collector:4317")
    assert(col1.isShutdown)
  }

  test("config: enable_tracing/tracing_endpoint parse, env-override, default off (settings.py:118-119)") {
    import graft.config._
    val off = PipelineConfig.load(None, _ => None)
    assert(!off.observability.enableTracing)
    assert(off.observability.tracingEndpoint.isEmpty)
    assert(Tracing.initFromConfig(off.observability).isEmpty)
    val env = Map(
      "CDC_OBSERVABILITY_ENABLE_TRACING" -> "true",
      "CDC_OBSERVABILITY_TRACING_ENDPOINT" -> "http://collector:4317")
    val on = PipelineConfig.load(None, env.get)
    assert(on.observability.enableTracing)
    assert(on.observability.tracingEndpoint.contains("http://collector:4317"))
    assert(Tracing.initFromConfig(on.observability).isDefined)
    assert(Tracing.get.serviceName == "cdc-pipeline")
  }

  test("file:// endpoint routes spans to a JSONL artifact: round-trip, " +
      "append across re-init, endpoint stamped as a resource attribute") {
    import graft.config._
    val dir = java.nio.file.Files.createTempDirectory("tracing-file")
    val path = dir.resolve("sub").resolve("spans.jsonl")
    val obs = ObservabilitySettings(enableTracing = true,
      tracingEndpoint = Some(s"file://$path"))
    val t = Tracing.initFromConfig(obs).get
    t.span("batch_write", "batch.size" -> 42L,
      "destination" -> "postgres")(())
    Tracing.shutdown() // flush + close the file
    val lines1 = java.nio.file.Files.readAllLines(path)
    assert(lines1.size == 1)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(lines1.get(0))
    assert(root.get("name").asText == "batch_write")
    assert(root.get("attributes").get("batch.size").asLong == 42L)
    assert(root.get("attributes").get("tracing.endpoint").asText ==
      s"file://$path")
    assert(root.get("end_time_unix_nano").asLong >=
      root.get("start_time_unix_nano").asLong)
    // a restarted pipeline EXTENDS the trace log, DLQ-style
    val t2 = Tracing.initFromConfig(obs).get
    t2.span("replicate_event", "event.id" -> "e1")(())
    Tracing.shutdown()
    val lines2 = java.nio.file.Files.readAllLines(path)
    assert(lines2.size == 2)
    assert(m.readTree(lines2.get(1)).get("name").asText == "replicate_event")
  }
}
