package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup
import graft.streaming.StreamingPassageDedup
import graft.streaming.StreamingPassageDedup.{Cut, Doc}

/** Online exact-passage dedup: later copies of a passage — in the same or
  * any later micro-batch — are cut against the remembered canonical
  * occurrence, with the same fingerprints the batch operator (d16) uses. */
class StreamingPassageDedupSpec extends SparkSpec {
  import spark.implicits._

  private val W = Dedup.PassageLen
  private val shared = (1 to 10).map(i => s"shared$i").mkString(" ")
  private def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")

  test("streaming passage cuts fire across micro-batches at batch-exact positions") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingPassageDedup.cuts(input.toDS())
      .writeStream.format("memory").queryName("passage_stream")
      .outputMode("append").start()

    // batch 1: doc 1 owns the passage (pos 5..14); doc 2 copies it
    input.addData(
      Doc(1L, s"${uniq("a", 5)} $shared ${uniq("z", 5)}"),
      Doc(2L, s"${uniq("b", 5)} $shared ${uniq("y", 5)}"))
    q.processAllAvailable()
    // batch 2: a third copy must cut against state remembered from batch 1,
    // and a re-delivery of doc 1 (source retry) must emit nothing
    input.addData(
      Doc(3L, s"${uniq("c", 5)} $shared ${uniq("x", 5)}"),
      Doc(1L, s"${uniq("a", 5)} $shared ${uniq("z", 5)}"))
    q.processAllAvailable()
    q.stop()

    val cuts = spark.table("passage_stream").as[Cut].collect()
    // windows fully inside the 10-token passage start at 5, 6, 7
    val wanted = (5L to 7L)
    assert(cuts.map(_.doc_id).toSet == Set(2L, 3L))
    Seq(2L, 3L).foreach { d =>
      assert(cuts.filter(_.doc_id == d).map(_.pos).sorted.toSeq == wanted,
        s"doc $d cut positions")
    }
    assert(cuts.forall(_.canonical_doc == 1L))
  }

  test("streaming fingerprints equal the batch operator's window fingerprints") {
    val text = s"${uniq("p", 3)} $shared"
    val fps = StreamingPassageDedup.fingerprints(text)
    // 13 tokens -> 6 windows at stride 1, positions 0..5
    assert(fps.map(_._2) == (0L to 5L))
    // the batch operator over two docs sharing this text yields cuts at
    // EVERY window of the later doc: same md5 family <=> full overlap
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val spans = Dedup.passageCutsOf(docs).collect()
    assert(spans.length == 1)
    val r = spans.head
    assert(r.getAs[Long]("doc_id") == 2L)
    assert(r.getAs[Long]("span_start") == 0L &&
      r.getAs[Long]("span_end") == 13L && r.getAs[Long]("n_windows") == 6L)
    // short docs produce no windows
    assert(StreamingPassageDedup.fingerprints(uniq("q", W - 1)).isEmpty)
  }
}
