package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.LatestStateProcessor
import graft.streaming.LatestStateProcessor.{Change, KeyState}

/** transformWithState CDC materialization: last-write-wins per key,
  * tombstones emitted as deleted=true, out-of-order events ignored —
  * UpsertStateStore's MERGE semantics, held in stream state. */
class LatestStateProcessorSpec extends SparkSpec {
  import spark.implicits._

  test("latest state per key with LWW, tombstones, out-of-order drops") {
    // transformWithState needs column families ⇒ RocksDB provider
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Change]
    val q = LatestStateProcessor.latestState(input.toDS())
      .writeStream.format("memory").queryName("tws_latest")
      .outputMode("update").start()

    input.addData(
      Change("u1", "INSERT", 100L, "v1"),
      Change("u2", "INSERT", 100L, "x1"))
    q.processAllAvailable()
    input.addData(
      Change("u1", "UPDATE", 300L, "v2"), // wins
      Change("u1", "UPDATE", 200L, "stale-in-same-batch"))
    q.processAllAvailable()
    input.addData(Change("u1", "UPDATE", 250L, "stale-across-batches"))
    q.processAllAvailable()
    input.addData(Change("u2", "DELETE", 400L, "ignored"))
    q.processAllAvailable()
    q.stop()

    // update mode: last row per key is its final state
    val last = spark.table("tws_latest").as[KeyState].collect()
      .groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.ts) }
    assert(last("u1") == KeyState("u1", 300L, "v2", deleted = false))
    assert(last("u2") == KeyState("u2", 400L, null, deleted = true))
  }
}
