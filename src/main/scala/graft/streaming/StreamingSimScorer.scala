package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Similarity

/** Online ANN serving — the streaming consumer of the s15/s17 index
  * artifacts, completing the trained-artifact → online-consumption story
  * for the similarity family (p19 → [[StreamingDsirScorer]] and t19 →
  * [[StreamingCms]] are the siblings): the batch pipeline builds the
  * index ONCE (coarse centroids, PQ codebook, and the encoded corpus —
  * [[Index]]); arriving query vectors are answered per micro-batch by
  * the full two-stage retrieval (coarse probe → ADC over the compressed
  * lists → exact-decimal refine, `Similarity.ivfPqServe`), bit-identical
  * to the batch s16 answer for the same query vector (spec-proven).
  *
  * Shape: `foreachBatch` serving — each micro-batch of queries runs the
  * COMPLETE batch retrieval plan against the cached index, so the
  * per-query top-k windows and broadcast artifact joins (exactly s16's
  * plan) stay available; no state crosses batches — the index is a
  * read-only broadcast-shaped input and a restart re-serves from the
  * current artifacts, the [[StreamingDsirScorer]] redeploy story. At
  * 100 TB the centroids and codebook are kilobytes (broadcast), the
  * encoded lists are M bytes/vector (the cached static side the probe
  * join prunes by `cid`), and the refine stage fetches only
  * RefineK·|batch| full vectors — per-batch cost is proportional to the
  * QUERY BATCH, never the corpus.
  */
object StreamingSimScorer {

  /** The frozen serving artifacts — the BUILT index, not just its
    * inputs: coarse centroids, PQ codebook, the inverted-list assignment
    * (`assign`: vec_id → cid), the encoded corpus (`codes`: the M-byte
    * PQ form the ADC stage scores), and the raw vectors + norms the
    * refine stage fetches candidates from. All cached AND materialized
    * at build time, so a micro-batch's cost is probe + ADC over the
    * probed lists + RefineK·|batch| exact re-scores — proportional to
    * the QUERY BATCH, never the corpus (assignment/encoding happen once,
    * at deploy). */
  final case class Index(cents: DataFrame, cb: DataFrame, corpus: DataFrame,
      assign: DataFrame, codes: DataFrame,
      m: Int = Similarity.PqM, subDim: Int = Similarity.PqSubDim) {
    def unpersistAll(): Unit = {
      cents.unpersist(); cb.unpersist(); corpus.unpersist()
      assign.unpersist(); codes.unpersist()
    }
  }

  /** Build (and cache + materialize) the serving index from the corpus —
    * the batch side of the deploy: [[Similarity.centsOf]]/[[Similarity
    * .pqCodebook]] over the index members plus the derived assignment
    * and code tables, exactly the artifacts the batch s15/s16 queries
    * search with. The counts force materialization so the FIRST arriving
    * query batch doesn't pay the corpus-scale build. */
  def buildIndex(s: SparkSession, dir: String): Index =
    buildIndexFrom(Similarity.embeddings(s, dir))

  /** [[buildIndex]] over an EXPLICIT `(vec_id, embedding, nrm)` corpus
    * at an explicit PQ grid — the seam a non-text vector space (the m11
    * image features at the 16-dim grid) deploys through. The grid rides
    * in the [[Index]] so every consumer (serving, CDC encode) uses the
    * artifacts at the geometry they were trained at. */
  def buildIndexFrom(e0: DataFrame, m: Int = Similarity.PqM,
      subDim: Int = Similarity.PqSubDim,
      centroidStride: Int = Similarity.AdaptiveStride): Index = {
    val e = e0.persist()
    val cents = Similarity.centsOf(e, centroidStride).persist()
    val cb = Similarity.pqCodebook(e, m, subDim).persist()
    val assign = Similarity.ivfAssign(e, cents).persist()
    val codes = Similarity.pqCodesFor(e, cb, m, subDim).persist()
    Seq(e, cents, cb, assign, codes).foreach(_.count())
    Index(cents, cb, e, assign, codes, m, subDim)
  }

  /** The per-micro-batch kernel: serve a `(qid, embedding)` query frame
    * against the index — works identically on a stream's micro-batch or
    * a plain batch frame (the parity proof in the spec runs both).
    * `excludeSelfIds` drops corpus rows whose vec_id EQUALS a query's
    * qid — only correct when the qid space IS the corpus id space (the
    * s16 batch-parity case); leave false for external query ids. */
  def serve(queries: DataFrame, idx: Index,
      excludeSelfIds: Boolean = false): DataFrame =
    Similarity.ivfPqServe(queries, idx.corpus, idx.cents, idx.cb,
      m = idx.m, subDim = idx.subDim,
      assigned = Some(idx.assign), corpusCodes = Some(idx.codes),
      excludeSelfIds = excludeSelfIds)

  /** Attach the scorer to a streaming `(qid, embedding)` frame: each
    * micro-batch is served through [[serve]] and written to its own
    * `outDir/batch_id=N` partition with overwrite (foreachBatch — the
    * CdcPipeline sink pattern). A crash-replayed batch OVERWRITES its
    * own partition with byte-identical answers, so the sink is
    * idempotent — read `outDir` whole and batch_id appears as a
    * partition column. */
  def attach(queryStream: DataFrame, idx: Index, outDir: String,
      checkpointDir: String, excludeSelfIds: Boolean = false): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        serve(batch, idx, excludeSelfIds)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .start()
}
