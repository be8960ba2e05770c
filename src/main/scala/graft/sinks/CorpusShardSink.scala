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

  /** The cleaned corpus with its shard assignment (the write plan) — the
    * p04 rule (shard = (cum_before div ContextLen) div BinsPerShard)
    * computed as ONE window directly over the cleaned frame, so the
    * expensive cut pipeline is traversed once instead of self-joined. */
  private def planned(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    Sampling.applyCuts(s, dir)
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens_clean")).over(w), lit(0L)))
      .withColumn("shard_id",
        expr(s"(cum_before div ${Sampling.ContextLen}) " +
          s"div ${Sampling.BinsPerShard}"))
      .drop("cum_before")
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
    * `isnotnull(lang)`-only filter prunes nothing). Descends into
    * AdaptiveSparkPlanExec, which is a leaf to `collect` and would
    * otherwise hide every scan in an AQE-wrapped plan. */
  def prunesPartitions(df: DataFrame): Boolean =
    scanPartitionFilters(df.queryExecution.executedPlan).exists {
      case _: org.apache.spark.sql.catalyst.expressions.IsNotNull => false
      case _ => true
    }

  private def scanPartitionFilters(
      plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scanPartitionFilters(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scanPartitionFilters(q.plan) // materialized stages are leaves too
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.partitionFilters ++ plan.children.flatMap(scanPartitionFilters)
      case p => p.children.flatMap(scanPartitionFilters)
    }
}
