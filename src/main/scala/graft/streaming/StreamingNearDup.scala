package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TTLConfig}
import graft.operators.{Dedup, TextPrep}

/** Online near-duplicate detection — the streaming form of the batch
  * MinHash+LSH candidate generator (`Dedup.minhashLsh`): as documents
  * arrive, each is shingled, minhash-signed with the SAME universal-hash
  * family as the batch operator (one md5 per shingle, K integer mixes),
  * and banded; per (band, bucket) a `ListState` remembers which documents
  * live in the bucket, and every newcomer emits a candidate pair against
  * each of them. A corpus being crawled continuously gets its near-dup
  * candidates the moment the second copy lands — no nightly batch scan.
  *
  * Scale shape: state is keyed by bucket (shuffle on bucket key, the same
  * key the batch join uses), each bucket holds doc ids only, and a TTL
  * bounds the horizon — at 100 TB you near-dup against the last N days,
  * not all of history (the batch operator owns full-corpus sweeps).
  * Candidates are verified exactly downstream (same `array_intersect`
  * re-score as batch); pairs colliding in several bands surface once per
  * band and dedupe in that verify.
  */
object StreamingNearDup {

  final case class Doc(doc_id: Long, text: String)
  final case class BandedDoc(bucket: String, doc_id: Long)
  final case class Candidate(bucket: String, da: Long, db: Long)

  /** Plain-Scala mirror of TextPrep's shingle→base→minhash pipeline
    * (bit-identical constants: md5-derived mixes mod the same prime). */
  private[graft] def signature(text: String): Option[Seq[Long]] = {
    val t = TextPrep.jvmTokens(text)
    if (t.length < 3) return None
    val bases = t.sliding(3).map(_.mkString(" ")).toSet[String]
      .map(s => java.lang.Long.parseLong(TextPrep.md5hex(s).take(8), 16))
    Some((0 until Dedup.K).map(j =>
      bases.map(b => (TextPrep.mixA(j) * b + TextPrep.mixB(j)) % TextPrep.MinhashP).min))
  }

  /** Band keys, same banding scheme as the batch operator: md5 over the
    * band's signature rows, prefixed with the band index. */
  private[graft] def bandKeys(sig: Seq[Long]): Seq[String] =
    (0 until Dedup.Bands).map { b =>
      val rows = sig.slice(b * Dedup.RowsPerBand, (b + 1) * Dedup.RowsPerBand)
      s"$b:" + TextPrep.md5hex(rows.mkString(""))
    }

  class Processor(ttl: TTLConfig)
      extends StatefulProcessor[String, BandedDoc, Candidate] {
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, ttl)

    override def handleInputRows(bucket: String, rows: Iterator[BandedDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Candidate] = {
      val prior = if (members.exists()) members.get().toSeq else Seq.empty
      val incoming = rows.map(_.doc_id).toSeq.distinct.sorted
      val out = Seq.newBuilder[Candidate]
      var seen = prior
      incoming.foreach { d =>
        if (!seen.contains(d)) {
          seen.foreach(p =>
            out += Candidate(bucket, math.min(p, d), math.max(p, d)))
          members.appendValue(d)
          seen = seen :+ d
        }
      }
      out.result().iterator
    }
  }

  /** Wire a document stream to candidate pairs (append-mode output). */
  def candidates(docs: Dataset[Doc],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    docs.flatMap(d => signature(d.text).toSeq.flatMap(sig =>
        bandKeys(sig).map(k => BandedDoc(k, d.doc_id))))
      .groupByKey(_.bucket)
      .transformWithState(new Processor(ttl), StateStores.timeModeFor(ttl),
        OutputMode.Append())
  }
}
