package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.CoreQueries
import graft.streaming.{Scd2Event, StreamingScd2}

/** Stream↔batch parity for SCD Type-2 historization: the per-event
  * close-and-open maintainer must materialize exactly the q69 validity
  * table, across batching, within-batch disorder, and a kill-window
  * restart. */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def historySet(df: DataFrame) = df.collect().map { r =>
    (r.getAs[Long]("user_id"), r.getAs[Long]("version_event_id"),
      r.getAs[String]("state_type"), r.getAs[Double]("state_value"),
      r.getAs[Long]("valid_from_us"),
      if (r.isNullAt(r.fieldIndex("valid_to_us"))) None
      else Some(r.getAs[Long]("valid_to_us")),
      r.getAs[Boolean]("is_current"))
  }.toSet

  /** The full event feed in commit-log order (global (ts, id) sort
    * preserves every per-key order). */
  private def feed(): Array[Scd2Event] = Tables.events(spark, sf)
    .select($"user_id", $"event_id", $"event_type", $"value", $"ts_us")
    .as[(Long, Long, String, Double, Long)].collect()
    .sortBy(e => (e._5, e._2))
    .map { case (u, id, t, v, ts) => Scd2Event(u, id, t, v, ts) }

  test("stream-materialized history equals batch q69 after the last batch") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = feed()
    val input = MemoryStream[Scd2Event]
    val base = Files.createTempDirectory("graft-scd2")
    val store = base.resolve("store").toString
    val q = StreamingScd2.attach(input.toDS(), store,
      base.resolve("ckpt").toString)
    try {
      // chunks arrive in order; WITHIN a chunk arrival order is
      // scrambled — the processor must re-establish (ts, id) order
      val rnd = new scala.util.Random(7)
      events.grouped(math.max(1, events.length / 4)).foreach { g =>
        input.addData(rnd.shuffle(g.toSeq).toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = historySet(StreamingScd2.readHistory(spark, store))
    val batch = historySet(CoreQueries.q69Scd2History(spark, sf))
    assert(batch.nonEmpty && streamed == batch)
  }

  test("evict-closed mode: a silent entity's open version is CLOSED at " +
      "the deadline, its return opens fresh, and the read repairs the " +
      "wall-clock close so point-in-time never matches two versions") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Scd2Event]
    val base = Files.createTempDirectory("graft-scd2-evict")
    val store = base.resolve("store").toString
    val q = StreamingScd2.attachEvictClosed(input.toDS(), store,
      base.resolve("ckpt").toString, evictCloseMs = 2000L)
    try {
      def hist() = StreamingScd2.readHistory(spark, store).collect()
        .map { r =>
          (r.getAs[Long]("user_id"), r.getAs[Long]("version_event_id"),
            r.getAs[Long]("valid_from_us"),
            if (r.isNullAt(r.fieldIndex("valid_to_us"))) None
            else Some(r.getAs[Long]("valid_to_us")),
            r.getAs[Boolean]("is_current"))
        }.toSeq
      // ProcessingTime mode keeps scheduling timer batches —
      // processAllAvailable never settles; poll the maintained store
      def await(pred: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 120000
        while (System.currentTimeMillis() < deadline && !pred)
          Thread.sleep(250)
        assert(pred)
      }
      input.addData(Scd2Event(1L, 100L, "login", 1.0, 1000L))
      await(hist().exists(r => r._2 == 100L && r._4.isEmpty && r._5))
      // the eviction timer fires: the open version lands CLOSED in the
      // store (valid_to = the wall-clock deadline), not silently dropped
      await(hist().exists(r => r._2 == 100L && r._4.nonEmpty && !r._5))
      // the entity returns AFTER eviction with an event-time that
      // precedes the wall-clock deadline — the tear case
      input.addData(Scd2Event(1L, 200L, "purchase", 2.0, 9000L))
      await(hist().exists(r => r._2 == 200L && r._4.isEmpty && r._5))
      val h = hist()
      // exactly one current row, and the read caps the evict-close at
      // the successor's valid_from: v100 = [1000, 9000), v200 = [9000, ∞)
      assert(h.count(_._5) == 1)
      assert(h.exists(r => r._2 == 100L && r._4.contains(9000L) && !r._5))
      // point-in-time semantics: every instant matches at most one row
      Seq(1000L, 5000L, 9000L, 20000L).foreach { t =>
        val matches = h.count(r =>
          r._3 <= t && r._4.forall(t < _))
        assert(matches <= 1, s"instant $t matched $matches versions")
      }
    } finally q.stop()
  }

  test("kill mid-feed, restart from checkpoint: history still q69-exact") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = feed()
    val (first, rest) = events.splitAt(events.length / 2)
    val input = MemoryStream[Scd2Event]
    val base = Files.createTempDirectory("graft-scd2-restart")
    val store = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString
    val q1 = StreamingScd2.attach(input.toDS(), store, ckpt)
    try { input.addData(first.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    // kill window: the tail arrives while nothing runs; the restart
    // recovers open-version state from the checkpoint — versions left
    // open at the kill must close at their NEXT event, exactly once
    input.addData(rest.toIndexedSeq)
    val q2 = StreamingScd2.attach(input.toDS(), store, ckpt)
    try q2.processAllAvailable()
    finally q2.stop()
    val streamed = historySet(StreamingScd2.readHistory(spark, store))
    val batch = historySet(CoreQueries.q69Scd2History(spark, sf))
    assert(batch.nonEmpty && streamed == batch)
  }

  test("compaction folds history into the base partition: view unchanged, " +
      "replay after compaction changes nothing, maintenance continues") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = feed()
    val (first, rest) = events.splitAt(events.length / 2)
    val input = MemoryStream[Scd2Event]
    val base = Files.createTempDirectory("graft-scd2-compact")
    val store = base.resolve("store").toString
    val compacted = base.resolve("store2").toString
    val ckpt = base.resolve("ckpt").toString
    val q1 = StreamingScd2.attach(input.toDS(), store, ckpt)
    try { input.addData(first.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val mid = historySet(StreamingScd2.readHistory(spark, store))

    StreamingScd2.compact(spark, store, compacted)
    // base+tail view ≡ pre-compaction view, and ONLY the base exists
    assert(historySet(StreamingScd2.readHistory(spark, compacted)) == mid)
    assert(new java.io.File(compacted).listFiles().map(_.getName).toSet ==
      Set(s"batch_id=${StreamingScd2.CompactedBatchId}"))

    // a crash-replayed pre-compaction batch lands its rows beside the
    // base; every row either loses to the base's closed form or
    // duplicates it byte-identically — the resolved view is unchanged
    val batch0 = spark.read
      .parquet(s"$store/batch_id=0")
      .drop("batch_id")
    batch0.write.mode("overwrite").parquet(s"$compacted/batch_id=0")
    assert(historySet(StreamingScd2.readHistory(spark, compacted)) == mid)

    // maintenance continues onto the compacted store with the ORIGINAL
    // checkpoint (open-version state lives there): final history is
    // q69-exact
    input.addData(rest.toIndexedSeq)
    val q2 = StreamingScd2.attach(input.toDS(), compacted, ckpt)
    try q2.processAllAvailable()
    finally q2.stop()
    val streamed = historySet(StreamingScd2.readHistory(spark, compacted))
    val batch = historySet(CoreQueries.q69Scd2History(spark, sf))
    assert(batch.nonEmpty && streamed == batch)
  }

  test("delete closes without opening; point-in-time reads through the " +
      "maintained store match the batch table") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // one entity: open A, update to B, delete, reopen C — the full
    // close/open/terminate cycle in three batches
    val input = MemoryStream[Scd2Event]
    val base = Files.createTempDirectory("graft-scd2-del")
    val store = base.resolve("store").toString
    val q = StreamingScd2.attach(input.toDS(), store,
      base.resolve("ckpt").toString)
    try {
      Seq(
        Seq(Scd2Event(1L, 10L, "view", 1.0, 1000L)),
        Seq(Scd2Event(1L, 11L, "purchase", 2.0, 2000L),
          Scd2Event(1L, 12L, "error", 0.0, 3000L)),
        Seq(Scd2Event(1L, 13L, "view", 3.0, 4000L))
      ).foreach { b => input.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
    val h = StreamingScd2.readHistory(spark, store)
    assert(historySet(h) == Set(
      (1L, 10L, "view", 1.0, 1000L, Some(2000L), false),
      (1L, 11L, "purchase", 2.0, 2000L, Some(3000L), false),
      // the delete marker closed 11 and opened NOTHING; 13 reopens
      (1L, 13L, "view", 3.0, 4000L, None, true)))
    // a point-in-time read at t=2500 sees version 11; at t=3500 (inside
    // the deleted gap) sees nothing — the q70 AS-OF rule over the
    // maintained store
    def asOf(t: Long) = h.filter(col("valid_from_us") < t &&
      (col("valid_to_us").isNull || col("valid_to_us") >= t))
      .select("version_event_id").as[Long].collect().toSeq
    assert(asOf(2500L) == Seq(11L))
    assert(asOf(3500L).isEmpty)
    assert(asOf(4500L) == Seq(13L))
  }
}
