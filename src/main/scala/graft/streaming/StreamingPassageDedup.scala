package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TTLConfig, ValueState}
import graft.operators.{Dedup, TextPrep}

/** Online passage-level exact-substring dedup — the streaming form of the
  * batch cut-list operator (`Dedup.passageCuts`, d16): as documents
  * arrive, each is split into the SAME stride-1 [[Dedup.PassageLen]]-token
  * window fingerprints (md5 of the space-joined window, TextPrep token
  * convention), and per fingerprint a `ValueState` remembers the canonical
  * first occurrence. Every later occurrence — same batch or any later
  * micro-batch — emits a cut decision `(doc_id, pos, canonical_doc)` the
  * moment it lands, so a crawler dropping boilerplate passages doesn't
  * wait for the nightly batch sweep. Replays of the canonical occurrence
  * itself (source retries) are recognized and emit nothing.
  *
  * Scale shape: state is keyed by fingerprint — the same high-cardinality
  * key the batch window pass shuffles on — and holds one (doc, pos) pair
  * per distinct passage; a TTL bounds the horizon exactly as in
  * [[StreamingNearDup]] (stream dedups against the recent past, the batch
  * operator owns full-corpus sweeps). Downstream, per-doc span merging is
  * the batch gaps-and-islands step over the emitted positions.
  */
object StreamingPassageDedup {

  final case class Doc(doc_id: Long, text: String)
  final case class WindowFp(fp: String, doc_id: Long, pos: Long)
  final case class Owner(doc: Long, pos: Long)
  final case class Cut(doc_id: Long, pos: Long, canonical_doc: Long)

  /** Plain-Scala mirror of the batch operator's window fingerprints
    * (bit-identical: lower/trim, whitespace split, md5 of the
    * space-joined [[Dedup.PassageLen]]-token window). */
  private[graft] def fingerprints(text: String): Seq[(String, Long)] = {
    val t = TextPrep.jvmTokens(text)
    val w = Dedup.PassageLen
    if (t.length < w) Seq.empty
    else t.sliding(w).zipWithIndex
      .map { case (win, i) => (TextPrep.md5hex(win.mkString(" ")), i.toLong) }
      .toSeq
  }

  class Processor(ttl: TTLConfig)
      extends StatefulProcessor[String, WindowFp, Cut] {
    @transient private var owner: ValueState[Owner] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Owner]("owner",
        Encoders.product[Owner], ttl)

    override def handleInputRows(fp: String, rows: Iterator[WindowFp],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Cut] = {
      // smallest (doc_id, pos) first: within-batch canonicalization uses
      // the exact order the batch operator's ROW_NUMBER would pick
      val arr = rows.toSeq.sortBy(r => (r.doc_id, r.pos))
      var own = if (owner.exists()) Option(owner.get()) else None
      val out = Seq.newBuilder[Cut]
      arr.foreach { r =>
        own match {
          case None =>
            own = Some(Owner(r.doc_id, r.pos))
            owner.update(own.get)
          case Some(o) if o.doc == r.doc_id && o.pos == r.pos => () // replay
          case Some(o) => out += Cut(r.doc_id, r.pos, o.doc)
        }
      }
      out.result().iterator
    }
  }

  /** Wire a document stream to cut decisions (append-mode output). */
  def cuts(docs: Dataset[Doc],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Cut] = {
    import docs.sparkSession.implicits._
    docs.flatMap(d => fingerprints(d.text)
        .map { case (fp, pos) => WindowFp(fp, d.doc_id, pos) })
      .groupByKey(_.fp)
      .transformWithState(new Processor(ttl), StateStores.timeModeFor(ttl),
        OutputMode.Append())
  }
}
