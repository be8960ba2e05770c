package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Corpus shard writer — executes the p15 shard-planning RULE as an
  * actual on-disk artifact: the cleaned corpus (p16's span-removed text)
  * is packed through the SAME p04 layout rule — but over the token
  * masses it actually ships, so the resulting manifest describes the
  * written shards exactly — and laid out one directory per (lang,
  * shard = contiguous [[Sampling.BinsPerShard]]-bin run), ZSTD parquet
  * within each shard.
  *
  * Scale properties at 100 TB:
  *  - per-(lang, shard) training readers prune whole directories
  *    (PartitionFilters — a trainer pulling shard 17 of 'de' never lists
  *    anything else);
  *  - the layout is a pure function of the cleaned corpus (p04's
  *    deterministic packing), so a re-run writes byte-identical shard
  *    assignments — resumable, diffable, cache-friendly;
  *  - writing is one doc_id equi-join (plan × cleaned text) and one
  *    partitioned write — no extra shuffle beyond the partitionBy
  *    clustering.
  */
object CorpusShardSink {

  /** The cleaned corpus with its shard assignment (the write plan). */
  private def planned(s: SparkSession, dir: String): DataFrame = {
    val cleaned = Sampling.applyCuts(s, dir)
    val plan = Sampling.packingOf(cleaned.select(col("doc_id"), col("lang"),
        col("n_tokens_clean").as("n_tokens")))
      .select(col("doc_id"),
        expr(s"start_bin div ${Sampling.BinsPerShard}").as("shard_id"))
    cleaned.join(plan, "doc_id")
  }

  /** The manifest describing exactly what [[write]] ships — p15's rollup
    * over the cleaned corpus's packing. */
  def manifest(s: SparkSession, dir: String): DataFrame = {
    val cleaned = Sampling.applyCuts(s, dir)
    Sampling.shardManifestOf(Sampling.packingOf(
      cleaned.select(col("doc_id"), col("lang"),
        col("n_tokens_clean").as("n_tokens"))))
  }

  /** Write the cleaned, shard-partitioned corpus under `out`. */
  def write(s: SparkSession, dir: String, out: String): Unit =
    planned(s, dir)
      .write.mode("overwrite")
      .partitionBy("lang", "shard_id")
      .option("compression", "zstd")
      .parquet(out)

  /** Read back; (lang, shard_id) predicates become partition filters. */
  def read(s: SparkSession, out: String): DataFrame = s.read.parquet(out)

  /** True iff `df`'s scan prunes shard partitions: at least one
    * partition filter beyond the implicit IsNotNull guards (checked via
    * the scan node's API, not plan-string matching — an
    * `isnotnull(lang)`-only filter prunes nothing). */
  def prunesPartitions(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.partitionFilters
    }.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.IsNotNull => false
      case _ => true
    })
}
