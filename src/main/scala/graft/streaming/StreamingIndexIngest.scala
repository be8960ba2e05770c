package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Similarity

/** Online IVF-PQ index maintenance — the streaming twin of the batch s17
  * ingest, and [[StreamingSimScorer]]'s write-side mirror: vectors
  * arriving on a stream are assigned to their nearest FROZEN coarse
  * centroid and PQ-encoded through the FROZEN codebook per micro-batch,
  * then appended to the on-disk inverted index as `(vec_id, cid, m,
  * code, nrm)` rows partitioned by list id. Assignment and encoding are
  * per-vector functions of the frozen artifacts (the s17 spec's
  * ingest-equals-scratch-build property), so arrival batching cannot
  * change the index — streaming the corpus in N micro-batches lands the
  * SAME rows a one-shot batch build writes (spec-proven).
  *
  * Shape: per-batch cost is |batch|·K assignment dots + |batch|·M·K
  * encode dots, all against broadcast artifacts — corpus-independent.
  * Each batch writes `indexDir/batch_id=N/cid=…`; a crash-replayed batch
  * OVERWRITES its own partition byte-identically (the
  * [[StreamingSimScorer.attach]] idempotence contract), and a reader
  * scans `indexDir` whole with `cid` available for partition pruning —
  * exactly the probe-side prune the s15/s16 search plans run. */
object StreamingIndexIngest {

  /** One micro-batch's index rows — works identically on a stream's
    * micro-batch or a plain batch frame (the parity proof runs both).
    * Input: `(vec_id, embedding)`; output: `(vec_id, nrm, m, code, cid)`,
    * M rows per vector. */
  def encode(vectors: DataFrame, idx: StreamingSimScorer.Index): DataFrame = {
    val e = Similarity.withNorm(vectors.select(col("vec_id"),
      col("embedding")))
    val assigned = Similarity.ivfAssign(e, idx.cents)
    Similarity.pqCodesFor(e, idx.cb, idx.m, idx.subDim)
      .join(assigned, "vec_id")
  }

  /** Attach the ingester to a streaming `(vec_id, embedding)` frame:
    * each micro-batch is encoded through [[encode]] and written to its
    * own `indexDir/batch_id=N` partition (cid-partitioned inside) with
    * overwrite — idempotent under crash replay. */
  def attach(vectorStream: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, checkpointDir: String): StreamingQuery =
    vectorStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        encode(batch, idx)
          .write.mode("overwrite").partitionBy("cid")
          .parquet(s"$indexDir/batch_id=$batchId")
        ()
      }
      .start()
}
