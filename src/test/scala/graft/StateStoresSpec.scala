package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StateStores

/** RocksDB-backed streaming dedup: the provider actually engages, state
  * survives a query restart (changelog checkpointing), and the watermark
  * bounds what must be remembered.
  */
class StateStoresSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int) = new Timestamp(1700000000000L + minutes * 60000L)

  test("dropDuplicatesWithinWatermark on RocksDB dedups across restart") {
    StateStores.useRocksDb(spark, boundedMemMb = 256)
    val ckpt = Files.createTempDirectory("graft-rocks-ckpt").toString
    val out = Files.createTempDirectory("graft-rocks-out").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]

    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      input.toDF().toDF("k", "event_time")
        .withWatermark("event_time", "10 minutes")
        .dropDuplicatesWithinWatermark("k")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()

    try {
      val q1 = run()
      input.addData(("k1", ts(0)), ("k2", ts(1)), ("k1", ts(2)))
      q1.processAllAvailable()
      // the provider reports rocksdb-specific metrics in progress
      val prog = q1.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(prog.nonEmpty && prog.last.json.contains("rocksdb"),
        "expected RocksDB state store metrics in query progress")
      q1.stop()
      assert(spark.read.parquet(out).count() == 2)

      // restart: duplicate of k1 within the watermark horizon must still
      // be dropped — i.e. dedup state was recovered from the checkpoint
      input.addData(("k1", ts(3)), ("k3", ts(4)))
      val q2 = run()
      q2.processAllAvailable()
      q2.stop()
      val keys = spark.read.parquet(out).select("k").as[String].collect().sorted
      assert(keys.toSeq == Seq("k1", "k2", "k3"))
    } finally StateStores.useDefault(spark)
  }
}
