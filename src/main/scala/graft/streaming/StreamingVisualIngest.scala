package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.operators.Multimodal

/** One raw image-document change aimed at the visual index: the
  * documents-table row (BMPs are the even doc ids — the m-family
  * synthesizer convention) with the CDC op byte and commit-log
  * position. Deletes carry no payload. */
final case class ImageChange(seq: Long, docId: Long, op: String,
    text: String)

/** The shared per-change featurization core of the media ingests: the
  * decode runs under a caller-supplied SYNTHETIC id derived from `seq`
  * (the feature is a pure function of the text bytes — the id only
  * picks the codec branch — and the featurizer returns `vec_id =
  * synthetic/2 = seq`), then joins back on `seq`. ONE definition, so
  * the determinism rule — a batch carrying two versions of one
  * document pairs each seq with ITS OWN embedding, never a
  * cross-matched one — cannot drift between modalities. */
private[streaming] object MediaFeaturize {
  def featurize(batch: DataFrame,
      syntheticDocId: org.apache.spark.sql.Column,
      featuresOf: DataFrame => DataFrame): DataFrame = {
    val ups = batch.filter(col("op") =!= "D")
    val feats = featuresOf(
      ups.select(syntheticDocId.cast("long").as("doc_id"), col("text")))
      .select(col("vec_id").as("seq"), col("embedding"))
    ups.select(col("seq"),
        (col("doc_id") / 2).cast("long").as("vec_id"), col("op"))
      .join(feats, "seq")
      .select("seq", "vec_id", "op", "embedding")
      .unionByName(batch.filter(col("op") === "D")
        .select(col("seq"), (col("doc_id") / 2).cast("long").as("vec_id"),
          col("op"),
          lit(null).cast(ArrayType(FloatType)).as("embedding")))
  }

  /** The maintenance wiring BOTH media ingests share — one home for the
    * foreachBatch body and the stream attachment (trigger, checkpoint,
    * corpusDir plumbing), so the modalities cannot silently diverge on
    * anything but their featurizer. */
  def applyFeaturized(featurize: DataFrame => DataFrame, batch: DataFrame,
      idx: StreamingSimScorer.Index, indexDir: String, tombDir: String,
      batchId: Long, corpusDir: Option[String]): Unit =
    StreamingIndexCdc.applyBatch(featurize(batch), idx, indexDir,
      tombDir, batchId, corpusDir)

  def attachFeaturized(featurize: DataFrame => DataFrame,
      docStream: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String, checkpointDir: String,
      corpusDir: Option[String]): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyFeaturized(featurize, batch, idx, indexDir, tombDir,
          batchId, corpusDir)
      }
      .start()
}

/** Streaming multimodal ingest — the m11 feature extraction run per
  * micro-batch, feeding [[StreamingIndexCdc]]: arriving image documents
  * are decoded (the real byte-level BMP codec) and histogram-featurized
  * IN-STREAM, then maintained as the visual ANN index through frozen
  * artifacts at the m11 16-dim PQ grid — image near-dup retrieval stays
  * online instead of batch-only, closing the last batch-only seam in
  * the multimodal→ANN composition.
  *
  * Everything downstream of featurization IS [[StreamingIndexCdc]]:
  * LWW per key by seq, versioned index rows + tombstones in idempotent
  * `batch_id` partitions, the maintained read view, compaction, and
  * serving — one maintenance engine, two vector spaces. The grid rides
  * in the [[StreamingSimScorer.Index]] artifacts, so encode and serve
  * run at the geometry the quantizers were trained at.
  *
  * Shape at 100 TB: decode + featurize are per-asset mapPartitions
  * work proportional to the BATCH; the maintenance writes stay
  * batch-proportional through the frozen broadcast artifacts. */
object StreamingVisualIngest {

  /** Featurize one micro-batch of image-document changes into the
    * [[VecChange]] contract `(seq, vec_id, op, embedding)`: upserts
    * decode → 16-bin histogram at `vec_id = doc_id / 2`; deletes pass
    * through with a null payload (there is nothing to decode). Keyed
    * per change row via [[MediaFeaturize]] — the synthetic EVEN id
    * `2·seq` selects the BMP codec branch. */
  def featurize(batch: DataFrame): DataFrame =
    MediaFeaturize.featurize(batch, col("seq") * 2,
      Multimodal.imageFeaturesOf)

  /** Apply ONE batch of `(seq, doc_id, op, text)` image-document changes
    * to the visual index — the foreachBatch body, callable directly for
    * backfills and replay (featurization is deterministic, so a
    * replayed batch recomputes byte-identical rows). */
  def applyBatch(batch: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String, batchId: Long,
      corpusDir: Option[String] = None): Unit =
    MediaFeaturize.applyFeaturized(featurize, batch, idx, indexDir,
      tombDir, batchId, corpusDir)

  /** Attach the visual maintainer to a streaming
    * `(seq, doc_id, op, text)` frame. */
  def attach(docStream: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String, checkpointDir: String,
      corpusDir: Option[String] = None): StreamingQuery =
    MediaFeaturize.attachFeaturized(featurize, docStream, idx, indexDir,
      tombDir, checkpointDir, corpusDir)
}
