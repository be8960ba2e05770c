package graft.obs

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming metrics bridge carrying the reference's observability
  * vocabulary (`src/observability/metrics.py:10-43`):
  * `cdc_events_processed_total`, `cdc_events_per_second`,
  * `cdc_replication_duration_seconds`, `cdc_errors_total`,
  * `cdc_backlog_depth` — fed from Spark's `StreamingQueryListener`
  * progress events instead of hand-maintained counters. Sink-health
  * states mirror `DestinationSink` (`src/models/destination_sink.py:
  * 14-20, 67-72`): DEGRADED above 1000 ms batch duration, UNHEALTHY on
  * error.
  */
final class MetricsListener extends StreamingQueryListener {

  sealed trait Health
  case object Healthy extends Health
  case object Degraded extends Health
  case object Unhealthy extends Health
  case object Unknown extends Health

  val DegradedThresholdMs = 1000L // destination_sink.py:67-72

  private val processedTotal = new AtomicLong(0)
  private val errorsTotal = new AtomicLong(0)
  private val durationSeconds = new DoubleAdder
  private val batches = new AtomicLong(0)
  @volatile private var lastEventsPerSecond: Double = 0.0
  @volatile private var lastBacklog: Long = 0
  // health PER QUERY: a single shared field let any healthy query's next
  // progress event erase another query's Unhealthy (and a supervised
  // restart wiped the failure before anyone observed it)
  private val healthByQuery = new ConcurrentHashMap[String, Health]()
  private val byQuery = new ConcurrentHashMap[String, Long]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    // putIfAbsent, not put: a checkpoint-based supervised restart reuses
    // the same query id, and a prior Unhealthy must stay visible until the
    // restarted query actually reports healthy progress — a plain put would
    // wipe the failure on restart before anyone observed it
    healthByQuery.putIfAbsent(event.id.toString, Unknown)
    ()
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    processedTotal.addAndGet(p.numInputRows)
    // p.name is null for unnamed queries and CHM.merge NPEs on null keys
    val key = Option(p.name).getOrElse(p.id.toString)
    byQuery.merge(key, p.numInputRows, (a, b) => a + b)
    lastEventsPerSecond = p.processedRowsPerSecond
    batches.incrementAndGet()
    val batchMs = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    durationSeconds.add(batchMs / 1000.0)
    // backlog analog: rows available but not yet processed this trigger
    lastBacklog = math.max(0L,
      (p.inputRowsPerSecond - p.processedRowsPerSecond).toLong)
    healthByQuery.put(p.id.toString,
      if (batchMs > DegradedThresholdMs) Degraded else Healthy)
    // one completed micro-batch = one span when tracing is on — the
    // reference's replicate_event unit lifted to Spark's batch
    // granularity (tracing.py:72-100; per-row spans at stream rates
    // would be the tracer tracing itself). Emitted retrospectively:
    // the span's start is backdated by the progress event's batch
    // duration so exported start/end nanos cover the actual batch
    // window (duration.ms rides along as the authoritative figure).
    // Costs nothing when Tracing was never initialized.
    Tracing.active.foreach(_.startSpanAt("micro_batch",
        System.currentTimeMillis() * 1000000L - batchMs * 1000000L,
        "query.name" -> key, "batch.id" -> p.batchId,
        "batch.size" -> p.numInputRows, "duration.ms" -> batchMs)
      .end())
    ()
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    if (event.exception.isDefined) {
      errorsTotal.incrementAndGet()
      healthByQuery.put(event.id.toString, Unhealthy)
    }
    // clean termination keeps the query's last observed health: erasing it
    // would flip the aggregate back to Unknown the moment a healthy query
    // stops, and a failure must stay visible until a NEW listener is
    // installed for the recovered deployment
    ()
  }

  /** Prometheus-style snapshot (names from metrics.py:10-43). */
  def snapshot: Map[String, Double] = Map(
    "cdc_events_processed_total" -> processedTotal.get.toDouble,
    "cdc_errors_total" -> errorsTotal.get.toDouble,
    "cdc_events_per_second" -> lastEventsPerSecond,
    "cdc_replication_duration_seconds_sum" -> durationSeconds.sum,
    "cdc_replication_duration_seconds_count" -> batches.get.toDouble,
    "cdc_backlog_depth" -> lastBacklog.toDouble)

  /** Prometheus text exposition of [[snapshot]] — the `/metrics` body the
    * reference serves (`src/observability/metrics.py:46-54`). Spark's own
    * executor/driver metrics export natively with
    * `spark.ui.prometheus.enabled=true` (+ the `PrometheusServlet` sink);
    * this covers the reference's CDC-specific series. */
  def prometheusText: String =
    snapshot.toSeq.sortBy(_._1).map { case (name, v) =>
      val typ = if (name.endsWith("_total") || name.endsWith("_sum") ||
        name.endsWith("_count")) "counter" else "gauge"
      s"# TYPE $name $typ\n$name $v"
    }.mkString("", "\n", "\n")

  /** Worst health across live queries (Unhealthy > Degraded > Unknown >
    * Healthy); Unknown when no query has reported yet. */
  def currentHealth: Health = {
    import scala.jdk.CollectionConverters._
    def sev(h: Health): Int = h match {
      case Unhealthy => 3; case Degraded => 2; case Unknown => 1
      case Healthy => 0
    }
    val hs = healthByQuery.values().asScala
    if (hs.isEmpty) Unknown else hs.maxBy(sev)
  }

  def processedFor(queryName: String): Long = byQuery.getOrDefault(queryName, 0L)
}
