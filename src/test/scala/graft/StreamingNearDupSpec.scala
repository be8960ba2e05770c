package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{Candidate, Doc}

/** Online LSH candidate generation: duplicates arriving in LATER
  * micro-batches pair against bucket members remembered in state. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val essay =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill every single morning"
  private val other =
    "completely different subject matter here involving databases query engines and distributed state management at scale"

  test("streaming near-dup pairs exact copies across micro-batches; strangers never pair") {
    graft.streaming.StateStores.useRocksDb(spark, boundedMemMb = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingNearDup.candidates(input.toDS())
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()

    input.addData(Doc(1L, essay), Doc(2L, other))
    q.processAllAvailable()
    input.addData(Doc(3L, essay)) // exact copy, later batch
    q.processAllAvailable()
    q.stop()

    val pairs = spark.table("neardup_stream").as[Candidate].collect()
      .map(c => (c.da, c.db)).toSet
    assert(pairs == Set((1L, 3L)),
      s"exact copy must pair with the original and nothing else: $pairs")
  }

  test("streaming signature matches the batch minhash family per band") {
    // identical text ⇒ identical band keys; disjoint text ⇒ all bands differ
    val a = StreamingNearDup.bandKeys(StreamingNearDup.signature(essay).get)
    val a2 = StreamingNearDup.bandKeys(StreamingNearDup.signature(essay).get)
    val b = StreamingNearDup.bandKeys(StreamingNearDup.signature(other).get)
    assert(a == a2 && a.size == graft.operators.Dedup.Bands)
    assert(a.toSet.intersect(b.toSet).isEmpty)
    // short documents produce no shingles and no signature
    assert(StreamingNearDup.signature("two words").isEmpty)
  }
}
