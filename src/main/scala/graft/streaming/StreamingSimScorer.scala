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

  /** The frozen serving artifacts: coarse centroids, PQ codebook, and
    * the indexed corpus (vectors + norms; the ADC stage reads only its
    * encoded form, the refine stage only the retrieved candidates).
    * All three are cached so every micro-batch re-reads memory, not
    * parquet. */
  final case class Index(cents: DataFrame, cb: DataFrame, corpus: DataFrame) {
    def unpersistAll(): Unit = {
      cents.unpersist(); cb.unpersist(); corpus.unpersist()
    }
  }

  /** Build (and cache) the serving index from the corpus — the batch
    * side of the deploy: [[Similarity.centsOf]]/[[Similarity
    * .pqCodebook]] over the index members, exactly the artifacts the
    * batch s15/s16 queries search with. */
  def buildIndex(s: SparkSession, dir: String): Index = {
    val e = Similarity.embeddings(s, dir)
    Index(Similarity.centsOf(e).persist(), Similarity.pqCodebook(e).persist(),
      e.persist())
  }

  /** The per-micro-batch kernel: serve a `(qid, embedding)` query frame
    * against the index — works identically on a stream's micro-batch or
    * a plain batch frame (the parity proof in the spec runs both). */
  def serve(queries: DataFrame, idx: Index): DataFrame =
    Similarity.ivfPqServe(queries, idx.corpus, idx.cents, idx.cb)

  /** Attach the scorer to a streaming `(qid, embedding)` frame: each
    * micro-batch is served through [[serve]] and appended to `outDir`
    * as parquet (foreachBatch — the CdcPipeline sink pattern; answers
    * are exactly-once per batch under the checkpoint). */
  def attach(queryStream: DataFrame, idx: Index, outDir: String,
      checkpointDir: String): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        serve(batch, idx).write.mode("append").parquet(outDir)
        ()
      }
      .start()
}
