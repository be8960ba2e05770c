package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.WindowedAggs

/** Event-time windows + watermark late-data semantics (SURVEY §2.9 — the
  * rigor the reference lacks). */
class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window aggregates by event time; late rows beyond watermark drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = WindowedAggs.tumbling(
      input.toDF().toDF("ts", "user", "v"),
      timeCol = "ts", watermark = "10 minutes", windowLen = "5 minutes",
      keyCol = "user", valueCol = "v")
    val q = agg.writeStream.format("memory").queryName("tumbled")
      .outputMode(OutputMode.Update).start()

    input.addData((ts(1), "u1", 1.0), (ts(3), "u1", 2.0), (ts(7), "u1", 4.0))
    q.processAllAvailable()
    // advance the watermark far ahead: max event 10:40 → watermark 10:30
    input.addData((ts(40), "u1", 8.0))
    q.processAllAvailable()
    // this event (10:02) is far behind the watermark → must be dropped
    input.addData((ts(2), "u1", 100.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tumbled")
      .select("window_start", "n", "total").as[(Timestamp, Long, Double)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.last }
    assert(rows(ts(0))._2 == 2 && rows(ts(0))._3 == 3.0) // 10:00–05, late row NOT added
    assert(rows(ts(5))._2 == 1 && rows(ts(5))._3 == 4.0)
    assert(rows(ts(40))._2 == 1)
  }

  test("streaming doc dedup drops re-ingested copies; whitespace-variant counts as dup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val dedup = WindowedAggs.streamingDocDedup(
      input.toDF().toDF("ts", "doc_id", "text"),
      textCol = "text", timeCol = "ts", watermark = "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("docdedup")
      .outputMode(OutputMode.Append).start()

    input.addData((ts(1), 1L, "the quick brown fox"),
      (ts(2), 2L, "a different document"),
      (ts(3), 3L, "THE  quick   Brown fox")) // canonical dup of doc 1
    q.processAllAvailable()
    input.addData((ts(5), 4L, "the quick brown fox")) // exact re-ingest
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("docdedup").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"expected first-seen docs only, got $kept")
  }

  test("session window merges gapped events per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = WindowedAggs.session(input.toDF().toDF("ts", "user"),
      timeCol = "ts", watermark = "10 minutes", gap = "5 minutes",
      keyCol = "user")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).start()

    // u1: events at 10:01, 10:04, 10:06 → one session; 10:20 → second
    input.addData((ts(1), "u1"), (ts(4), "u1"), (ts(6), "u1"), (ts(20), "u1"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions")
      .select("session_start", "n").as[(Timestamp, Long)].collect().toMap
    assert(rows(ts(1)) == 3)
    assert(rows(ts(20)) == 1)
  }

  test("stream-stream join pairs events inside the time band only") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(String, Timestamp)]
    val buys = MemoryStream[(String, Timestamp)]
    val joined = WindowedAggs.streamStreamJoin(
      views.toDF().toDF("user", "view_ts"),
      buys.toDF().toDF("r_user", "buy_ts"),
      keyCol = "user", leftTime = "view_ts", rightTime = "buy_ts",
      watermark = "10 minutes", maxDelay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()

    views.addData(("u1", ts(1)), ("u2", ts(2)))
    // u1 buys 3 min after viewing (in band); u2 buys 20 min after (out)
    buys.addData(("u1", ts(4)), ("u2", ts(22)))
    // advance both watermarks so the join state closes and results emit
    views.addData(("zz", ts(59)))
    buys.addData(("zz", ts(59)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin")
      .select("user", "view_ts", "buy_ts")
      .as[(String, Timestamp, Timestamp)].collect()
    assert(got.count(_._1 == "u1") == 1)
    assert(got.forall(_._1 != "u2")) // 20-minute delay is outside the band
  }

  test("stream-stream LEFT join null-pads unmatched rows after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(String, Timestamp)]
    val buys = MemoryStream[(String, Timestamp)]
    val joined = WindowedAggs.streamStreamLeftJoin(
      views.toDF().toDF("user", "view_ts"),
      buys.toDF().toDF("r_user", "buy_ts"),
      keyCol = "user", leftTime = "view_ts", rightTime = "buy_ts",
      watermark = "10 minutes", maxDelay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssljoin")
      .outputMode(OutputMode.Append).start()

    views.addData(("u1", ts(1)), ("u2", ts(2)))
    buys.addData(("u1", ts(4))) // only u1 converts
    // push the watermark far enough that u2's join state provably closes
    views.addData(("zz", ts(120)))
    buys.addData(("zz", ts(120)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssljoin")
      .select("user", "r_user")
      .as[(String, Option[String])].collect()
    // matched row carries the right side; unmatched u2 emits null-padded
    assert(got.contains(("u1", Some("u1"))))
    assert(got.contains(("u2", None)))
  }
}
