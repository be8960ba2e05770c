package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
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
    * pass through with a null payload. Keyed per change row via
    * [[MediaFeaturize]] — the synthetic ODD id `2·seq+1` selects the
    * WAV codec branch (floor division still brings `vec_id` back as
    * `seq`). */
  def featurize(batch: DataFrame): DataFrame =
    MediaFeaturize.featurize(batch, col("seq") * 2 + 1,
      Multimodal.audioFeaturesOf)

  /** Apply ONE batch of `(seq, doc_id, op, text)` audio-document changes
    * to the audio index — the foreachBatch body, callable directly for
    * backfills and replay. */
  def applyBatch(batch: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String, batchId: Long,
      corpusDir: Option[String] = None): Unit =
    MediaFeaturize.applyFeaturized(featurize, batch, idx, indexDir,
      tombDir, batchId, corpusDir)

  /** Attach the audio maintainer to a streaming
    * `(seq, doc_id, op, text)` frame. */
  def attach(docStream: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String, checkpointDir: String,
      corpusDir: Option[String] = None): StreamingQuery =
    MediaFeaturize.attachFeaturized(featurize, docStream, idx, indexDir,
      tombDir, checkpointDir, corpusDir)
}
