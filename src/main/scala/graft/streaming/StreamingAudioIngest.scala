package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.operators.Multimodal

/** One raw audio-document change aimed at the audio index: the
  * documents-table row (WAVs are the odd doc ids — the m-family
  * synthesizer convention) with the CDC op byte and commit-log
  * position. Deletes carry no payload. */
final case class AudioChange(seq: Long, docId: Long, op: String,
    text: String)

/** Streaming audio ingest — the m13 feature extraction run per
  * micro-batch, feeding [[StreamingIndexCdc]]: arriving audio documents
  * are decoded (the real byte-level WAV codec) and histogram-featurized
  * IN-STREAM, then maintained as the audio ANN index through frozen
  * artifacts at the m13 16-dim PQ grid — the WAV sibling of
  * [[StreamingVisualIngest]], so near-dup audio retrieval is online
  * with zero new maintenance machinery (one CDC engine, three vector
  * spaces: text, image, audio).
  *
  * Shape at 100 TB: identical to the visual path — decode + featurize
  * are per-asset mapPartitions work proportional to the BATCH; the
  * maintenance writes stay batch-proportional through the frozen
  * broadcast artifacts. */
object StreamingAudioIngest {

  /** Featurize one micro-batch of audio-document changes into the
    * [[VecChange]] contract `(seq, vec_id, op, embedding)`: upserts
    * decode → 16-bin PCM histogram at `vec_id = doc_id / 2`; deletes
    * pass through with a null payload.
    *
    * Features are keyed PER CHANGE ROW (the [[StreamingVisualIngest]]
    * determinism rule): the decode runs under a synthetic ODD id
    * `2·seq+1` — the feature is a pure function of the text bytes, the
    * id only picks the codec branch, and the floor division brings
    * `vec_id` back as `seq` — then joins back on `seq`, so a batch
    * carrying two versions of one document pairs each seq with its own
    * embedding. */
  def featurize(batch: DataFrame): DataFrame = {
    val ups = batch.filter(col("op") =!= "D")
    val feats = Multimodal.audioFeaturesOf(
      ups.select((col("seq") * 2 + 1).cast("long").as("doc_id"),
        col("text")))
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

  /** Apply ONE batch of `(seq, doc_id, op, text)` audio-document changes
    * to the audio index — the foreachBatch body, callable directly for
    * backfills and replay. */
  def applyBatch(batch: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String, batchId: Long,
      corpusDir: Option[String] = None): Unit =
    StreamingIndexCdc.applyBatch(featurize(batch), idx, indexDir,
      tombDir, batchId, corpusDir)

  /** Attach the audio maintainer to a streaming
    * `(seq, doc_id, op, text)` frame. */
  def attach(docStream: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String, checkpointDir: String,
      corpusDir: Option[String] = None): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idx, indexDir, tombDir, batchId, corpusDir)
      }
      .start()
}
