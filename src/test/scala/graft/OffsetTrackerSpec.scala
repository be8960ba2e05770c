package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.OffsetTracker
import graft.streaming.OffsetTracker._

/** Stateful offset tracking via mapGroupsWithState — monotonicity guard +
  * count accumulation (`src/models/offset.py:132-146`,
  * `tests/unit/test_offset_management.py:33-194`). */
class OffsetTrackerSpec extends SparkSpec {
  import spark.implicits._

  test("offsets accumulate counts and never regress in time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[OffsetUpdate]
    val key = OffsetKey("ecommerce", "users", 0, "postgres")

    val q = OffsetTracker.track(input.toDS())
      .writeStream.format("memory").queryName("offsets")
      .outputMode(OutputMode.Update).start()

    input.addData(
      OffsetUpdate(key, timestamp_micros = 1000, events = 10),
      OffsetUpdate(key, timestamp_micros = 2000, events = 5))
    q.processAllAvailable()
    // a regression (ts 500) plus more events: time must hold at 2000
    input.addData(OffsetUpdate(key, timestamp_micros = 500, events = 3))
    q.processAllAvailable()

    val rows = spark.table("offsets").as[ReplicationOffset].collect()
    val last = rows.last
    assert(last.last_event_timestamp_micros == 2000)
    assert(last.events_replicated_count == 18)
    q.stop()

    assert(OffsetTracker.lagMicros(last, nowMicros = 5000) == 3000)
    assert(OffsetTracker.lagMicros(last, nowMicros = 1000) == 0) // clamped
  }
}
