package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}
import graft.streaming.{AudioChange, StreamingAudioIngest,
  StreamingIndexCdc, StreamingIndexIngest, StreamingSimScorer}

/** Stream↔batch parity for the audio index: decoding + featurizing
  * audio documents per micro-batch and maintaining the index through
  * the CDC engine must land exactly the batch m13 build — and keep
  * serving the batch m13 answers — on the same final corpus. */
class StreamingAudioIngestSpec extends SparkSpec {
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

  test("streamed audio ingest maintains exactly the batch m13 index; " +
      "serving matches batch m13; deletes drop tracks from the lists") {
    val idx = StreamingSimScorer.buildIndexFrom(
      Similarity.withNorm(Multimodal.audioFeatures(spark, sf)),
      Multimodal.M11PqM, Multimodal.M11PqSubDim)
    try {
      val e = idx.corpus
      val docs = Tables.table(spark, sf, "documents")
        .filter($"doc_id" % 2 === 1)
        .select("doc_id", "text").as[(Long, String)].collect()
        .sortBy(_._1)
      var seq = 0L
      def nxt = { seq += 1; seq }
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      val input = MemoryStream[AudioChange]
      val base = Files.createTempDirectory("graft-audio-cdc")
      val indexDir = base.resolve("index").toString
      val tombDir = base.resolve("tomb").toString
      val q = StreamingAudioIngest.attach(
        input.toDF().select($"seq", $"docId".as("doc_id"), $"op", $"text"),
        idx, indexDir, tombDir, base.resolve("ckpt").toString)
      try {
        // the whole WAV corpus arrives as inserts across 3 micro-batches
        docs.grouped(math.max(1, docs.length / 3)).foreach { g =>
          input.addData(g.map { case (id, t) =>
            AudioChange(nxt, id, "I", t) }.toIndexedSeq)
          q.processAllAvailable()
        }
        // the maintained index IS the batch m13 build: in-stream decode +
        // featurize + frozen-artifact encode, batching invisible
        val live0 = StreamingIndexCdc.readIndex(spark, indexDir, tombDir)
        assert(rowSet(live0) == rowSet(StreamingIndexIngest.encode(
          e.select("vec_id", "embedding"), idx)) && rowSet(live0).nonEmpty)

        // serving m13's own queries through the maintained view equals
        // the batch audio ANN answer set
        val queries = e.filter(col("vec_id") < Similarity.NumQueries)
          .select(col("vec_id").as("qid"), col("embedding"))
        val served = StreamingIndexCdc.serve(queries, live0, e, idx,
          excludeSelfIds = true)
        assert(answers(served) ==
          answers(Multimodal.audioAnnQuery(spark, sf)))

        // a delete feed drops tracks: the view equals a one-shot encode
        // of the surviving corpus
        val delIds = e.select("vec_id").as[Long].collect()
          .filter(_ % 7 == 3).toSeq
        assert(delIds.nonEmpty)
        input.addData(delIds.map(i =>
          AudioChange(nxt, i * 2 + 1, "D", "")).toIndexedSeq)
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
}
