package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.streaming.StreamingCms
import graft.streaming.StreamingCms.{CellCount, Doc}

/** Online/offline sketch parity: the streaming count-min counters after
  * any stream prefix must equal the batch t19 sketch over the documents
  * seen so far. */
class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming CMS counters equal the batch sketch cell-for-cell") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[Doc].collect()
    val input = MemoryStream[Doc]
    val q = StreamingCms.counters(input.toDS())
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("append").start()
    val (first, second) = docs.splitAt(docs.length / 2)
    input.addData(first.toIndexedSeq)
    q.processAllAvailable()
    input.addData(second.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    // latest emission per cell IS the sketch
    val streamed = spark.table("cms_stream").as[CellCount].collect()
      .groupBy(c => (c.row, c.bucket))
      .map { case (k, cs) => k -> cs.map(_.count).max }
    // batch truth: t19's OWN sketch grid (the column-expression pipeline,
    // not the JVM mirror — a mirror bug cannot hide here)
    val expected = TextAnalysis.cmsSketch(spark, sf).collect()
      .map(r => (r.getAs[Int]("row"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(streamed == expected)
    // and the grid is the t19 geometry, fully keyed inside bounds
    streamed.keys.foreach { case (row, bucket) =>
      assert(row >= 0 && row < TextAnalysis.CmsDepth)
      assert(bucket >= 0 && bucket < TextAnalysis.CmsWidth)
    }
  }

  test("a non-NONE TTL starts and counts (ProcessingTime mode derived)") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val ttl = org.apache.spark.sql.streaming.TTLConfig(
      java.time.Duration.ofHours(1))
    val q = StreamingCms.counters(input.toDS(), ttl)
      .writeStream.format("memory").queryName("cms_ttl_stream")
      .outputMode("append").start()
    input.addData(Doc(1L, "alpha beta alpha"))
    // ProcessingTime mode keeps scheduling timer housekeeping batches, so
    // processAllAvailable never settles — poll for the emitted rows
    val expectedCells = StreamingCms.buckets("alpha beta alpha").distinct.size
    val deadline = System.currentTimeMillis() + 120000
    while (System.currentTimeMillis() < deadline &&
      spark.table("cms_ttl_stream").count() < expectedCells)
      Thread.sleep(500)
    q.stop()
    // within the TTL horizon the counters behave exactly as untimed:
    // "alpha" cells reach 2, "beta" cells 1, across CmsDepth rows each
    val counts = spark.table("cms_ttl_stream").as[CellCount].collect()
      .groupBy(c => (c.row, c.bucket))
      .map { case (k, cs) => k -> cs.map(_.count).max }
    val expected = Seq("alpha", "beta", "alpha")
      .flatMap(t => StreamingCms.buckets(t))
      .groupBy(identity).map { case (k, hs) => (k.row, k.bucket) -> hs.size.toLong }
    assert(counts == expected)
  }

  test("streaming bucket mirror matches the batch t19 estimates") {
    // every t19 heavy hitter's estimate equals min over the mirror's grid
    val grid = Tables.table(spark, sf, "documents")
      .select("text").as[String].collect()
      .flatMap(StreamingCms.buckets)
      .groupBy(h => (h.row, h.bucket))
      .map { case (k, hs) => k -> hs.size.toLong }
    val t19 = TextAnalysis.cmsHeavyHitters(spark, sf).collect()
    assert(t19.nonEmpty)
    t19.foreach { r =>
      val tok = r.getAs[String]("token")
      val est = StreamingCms.buckets(tok).take(TextAnalysis.CmsDepth)
        .map(h => grid((h.row, h.bucket))).min
      assert(r.getAs[Long]("cms_est") == est, s"token '$tok'")
    }
  }
}
