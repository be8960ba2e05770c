package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TTLConfig, ValueState}
import graft.operators.{TextAnalysis, TextPrep}

/** Streaming count-min sketch — the online form of the batch t19
  * heavy-hitters machinery: as documents arrive, every token updates the
  * same d×w counter grid (identical md5 row-hashes, identical geometry),
  * keyed by `(row, bucket)` with one `ValueState[Long]` per counter. The
  * stream emits each counter's running value after every micro-batch it
  * changes in, so a consumer always holds the sketch's current state —
  * and after any prefix of the stream, the counters equal what batch t19
  * would compute over exactly the documents seen so far (the spec proves
  * this equivalence).
  *
  * Scale shape: state is d×w cells TOTAL (a few thousand longs,
  * regardless of corpus size — the entire point of the sketch), shuffled
  * on the cell key so each counter lives on one task; per batch the
  * update cost is one map-side pre-aggregation (count per cell, done by
  * the groupByKey) plus d×w state reads at most. A TTL turns it into a
  * sliding-horizon sketch — frequency over the last N days, the form a
  * crawler's hot-content monitor actually runs. */
object StreamingCms {

  final case class Doc(doc_id: Long, text: String)
  final case class CellHit(row: Int, bucket: Long)
  final case class CellCount(row: Int, bucket: Long, count: Long)

  /** Plain-Scala mirror of t19's bucket derivation (md5("i:" || token),
    * first 8 hex chars, mod width) — bit-identical to the batch column
    * expression, like StreamingNearDup.signature mirrors the minhash. */
  private[graft] def buckets(text: String): Seq[CellHit] = {
    TextPrep.jvmTokens(text).flatMap { t =>
      (0 until TextAnalysis.CmsDepth).map { i =>
        val h = java.lang.Long.parseLong(
          TextPrep.md5hex(s"$i:$t").take(8), 16)
        CellHit(i, h % TextAnalysis.CmsWidth)
      }
    }
  }

  class Processor(ttl: TTLConfig)
      extends StatefulProcessor[(Int, Long), CellHit, CellCount] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, ttl)

    override def handleInputRows(key: (Int, Long), rows: Iterator[CellHit],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CellCount] = {
      val prior = if (count.exists()) count.get() else 0L
      val updated = prior + rows.size
      count.update(updated)
      Iterator.single(CellCount(key._1, key._2, updated))
    }
  }

  /** Wire a document stream to running sketch-counter updates. The
    * output stream carries, per micro-batch, the new value of every
    * counter that batch touched (append mode; the latest row per cell
    * IS the sketch). */
  def counters(docs: Dataset[Doc],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CellCount] = {
    import docs.sparkSession.implicits._
    docs.filter((d: Doc) => d.text != null)
      .flatMap(d => buckets(d.text))
      .groupByKey(h => (h.row, h.bucket))
      .transformWithState(new Processor(ttl), StateStores.timeModeFor(ttl),
        OutputMode.Append())
  }
}
