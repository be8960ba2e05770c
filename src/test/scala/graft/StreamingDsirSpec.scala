package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row
import graft.operators.Sampling
import graft.streaming.StreamingDsirScorer

/** [[StreamingDsirSpec]]'s stream element (top-level: Spark encoders
  * cannot instantiate a suite-inner case class). */
case class DsirInDoc(doc_id: Long, lang: String, text: String)

/** Train-offline / score-online parity: the p19 batch trainer's bucket
  * table, embedded as a literal map, must reproduce the batch scorer's
  * document scores exactly — from a stream. */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming DSIR scores equal the batch p19 pass document-for-document") {
    val classes = StreamingDsirScorer.trainedClasses(
      Sampling.dsirBucketClasses(spark, sf))
    assert(classes.size == Sampling.DsirBuckets)

    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "lang", "text").as[DsirInDoc].collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DsirInDoc]
    val q = StreamingDsirScorer.score(input.toDF(), classes)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    // two micro-batches: scores must not depend on arrival batching
    val (first, second) = docs.splitAt(docs.length / 2)
    input.addData(first.toIndexedSeq)
    q.processAllAvailable()
    input.addData(second.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    def key(r: Row) = r.getAs[Long]("doc_id")
    def body(r: Row) = (r.getAs[Long]("n_tokens"),
      r.getAs[Long]("dsir_points"), r.getAs[Int]("keep"),
      r.getAs[Double]("mean_class"))
    val streamed = spark.table("dsir_stream").collect()
      .map(r => key(r) -> body(r)).toMap
    val batch = Sampling.dsirWeighting(spark, sf).collect()
      .map(r => key(r) -> body(r)).toMap
    assert(streamed.size == docs.length)
    assert(streamed == batch,
      "stream-scored documents must match the batch p19 output exactly")
  }

  test("scorer rejects a bucket table that does not cover the feature space") {
    val partial = (0L until (Sampling.DsirBuckets - 1).toLong).map(_ -> 0).toMap
    val df = Seq((1L, "en", "hello world")).toDF("doc_id", "lang", "text")
    assertThrows[IllegalArgumentException] {
      StreamingDsirScorer.score(df, partial)
    }
  }
}
