package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}
import graft.streaming.{ImageChange, StreamingIndexCdc,
  StreamingIndexIngest, StreamingSimScorer, StreamingVisualIngest}

/** Stream↔batch parity for the visual index: decoding + featurizing
  * image documents per micro-batch and maintaining the index through
  * the CDC engine must land exactly the batch m11 build — and keep
  * serving the batch m11 answers — on the same final corpus. */
class StreamingVisualIngestSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rowSet(df: DataFrame) = df
    .select("vec_id", "m", "code", "cid").collect()
    .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("m"),
      r.getAs[Int]("code"), r.getAs[Long]("cid"))).toSet

  private def answers(df: DataFrame) = df
    .select("qid", "rank", "neighbor_id", "cos_sim").collect()
    .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toSet

  test("streamed image ingest maintains exactly the batch m11 index; " +
      "serving matches batch m11; deletes drop images from the lists") {
    val idx = StreamingSimScorer.buildIndexFrom(
      Similarity.withNorm(Multimodal.imageFeatures(spark, sf)),
      Multimodal.M11PqM, Multimodal.M11PqSubDim)
    try {
      val e = idx.corpus
      val docs = Tables.table(spark, sf, "documents")
        .filter($"doc_id" % 2 === 0)
        .select("doc_id", "text").as[(Long, String)].collect()
        .sortBy(_._1)
      var seq = 0L
      def nxt = { seq += 1; seq }
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      val input = MemoryStream[ImageChange]
      val base = Files.createTempDirectory("graft-visual-cdc")
      val indexDir = base.resolve("index").toString
      val tombDir = base.resolve("tomb").toString
      val q = StreamingVisualIngest.attach(
        input.toDF().select($"seq", $"docId".as("doc_id"), $"op", $"text"),
        idx, indexDir, tombDir, base.resolve("ckpt").toString)
      try {
        // the whole BMP corpus arrives as inserts across 3 micro-batches
        docs.grouped(math.max(1, docs.length / 3)).foreach { g =>
          input.addData(g.map { case (id, t) =>
            ImageChange(nxt, id, "I", t) }.toIndexedSeq)
          q.processAllAvailable()
        }
        // the maintained index IS the batch m11 build: in-stream decode +
        // featurize + frozen-artifact encode, batching invisible
        val live0 = StreamingIndexCdc.readIndex(spark, indexDir, tombDir)
        assert(rowSet(live0) == rowSet(StreamingIndexIngest.encode(
          e.select("vec_id", "embedding"), idx)) && rowSet(live0).nonEmpty)

        // serving m11's own queries through the maintained view equals
        // the batch visual ANN answer set
        val qids = Multimodal.visualDupRecallQuery(spark, sf)
          .select("qid").distinct()
        val queries = e.join(qids, col("vec_id") === qids("qid"))
          .select(col("qid"), col("embedding"))
        val served = StreamingIndexCdc.serve(queries, live0, e, idx,
          excludeSelfIds = true)
        assert(answers(served) ==
          answers(Multimodal.visualAnnQuery(spark, sf)))

        // a delete feed drops images: the view equals a one-shot encode
        // of the surviving corpus
        val delIds = e.select("vec_id").as[Long].collect()
          .filter(_ % 7 == 3).toSeq
        assert(delIds.nonEmpty)
        input.addData(delIds.map(i =>
          ImageChange(nxt, i * 2, "D", "")).toIndexedSeq)
        q.processAllAvailable()
        val live1 = StreamingIndexCdc.readIndex(spark, indexDir, tombDir)
        val surv = e.filter(!col("vec_id").isin(delIds: _*))
        assert(rowSet(live1) == rowSet(StreamingIndexIngest.encode(
          surv.select("vec_id", "embedding"), idx)))
        assert(live1.select("vec_id").as[Long].collect().toSet
          .intersect(delIds.toSet).isEmpty)
      } finally q.stop()
    } finally idx.unpersistAll()
  }

  test("a batch carrying two versions of one document pairs each seq " +
      "with its own embedding — the LWW winner's payload is its own") {
    // 40-byte ASCII texts with visibly different byte histograms
    val textA = "a" * 40            // all bytes 0x61 -> bin 6
    val textB = "z" * 20 + "A" * 20 // 0x7a -> bin 7, 0x41 -> bin 4
    def hist(t: String): Seq[Float] = {
      val b = t.getBytes("UTF-8")
      val w = 4 * (b.length % 3 + 1); val h = b.length / (3 * w)
      val out = new Array[Float](16)
      b.take(3 * w * h).foreach(v => out((v & 0xff) >> 4) += 1f)
      out.toSeq
    }
    val batch = Seq((1L, 4L, "I", textA), (2L, 4L, "I", textB))
      .toDF("seq", "doc_id", "op", "text")
    val got = StreamingVisualIngest.featurize(batch)
      .select("seq", "vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("seq"), r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding"))).toSet
    assert(got == Set((1L, 2L, hist(textA)), (2L, 2L, hist(textB))))
  }
}
