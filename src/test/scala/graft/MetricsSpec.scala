package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.obs.MetricsListener

/** Listener-driven metrics with the reference's Prometheus names
  * (`src/observability/metrics.py:10-43`, `tests/unit/test_metrics.py`). */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("listener accumulates processed counts, durations, health") {
    val listener = new MetricsListener
    spark.streams.addListener(listener)
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Int]
      val q = input.toDS().toDF("v")
        .writeStream.format("memory").queryName("metrics_probe").start()
      input.addData(1 to 100: _*)
      q.processAllAvailable()
      input.addData(1 to 50: _*)
      q.processAllAvailable()
      q.stop()

      // listener events are async — wait for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (listener.snapshot("cdc_events_processed_total") < 150 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)

      val snap = listener.snapshot
      assert(snap("cdc_events_processed_total") == 150.0)
      assert(snap("cdc_replication_duration_seconds_count") >= 2.0)
      assert(snap("cdc_errors_total") == 0.0)
      assert(listener.processedFor("metrics_probe") == 150L)
      assert(listener.currentHealth != listener.Unknown)
    } finally spark.streams.removeListener(listener)
  }

  test("unnamed queries do not kill the listener (progress.name is null)") {
    val listener = new MetricsListener
    spark.streams.addListener(listener)
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Int]
      val q = input.toDS().toDF("v") // no queryName: progress.name == null
        .writeStream.format("noop").start()
      input.addData(1 to 10: _*)
      q.processAllAvailable()
      q.stop()

      val deadline = System.currentTimeMillis() + 10000
      while (listener.snapshot("cdc_events_processed_total") < 10 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)

      // before the null-guard, merge(null, …) NPE'd and every metric after
      // processedTotal silently stopped updating
      assert(listener.snapshot("cdc_events_processed_total") == 10.0)
      assert(listener.snapshot("cdc_replication_duration_seconds_count") >= 1.0)
      assert(listener.processedFor(q.id.toString) == 10L)
    } finally spark.streams.removeListener(listener)
  }
}
