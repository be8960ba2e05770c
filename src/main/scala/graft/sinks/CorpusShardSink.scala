package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Corpus shard writer — executes p15's write PLAN as an actual on-disk
  * artifact: the cleaned corpus (p16's span-removed text), laid out one
  * directory per (lang, shard) exactly as the shard manifest planned it
  * (shard = contiguous [[Sampling.BinsPerShard]]-bin run of p04's packing
  * order), ZSTD parquet within each shard.
  *
  * Scale properties at 100 TB:
  *  - per-(lang, shard) training readers prune whole directories
  *    (PartitionFilters — a trainer pulling shard 17 of 'de' never lists
  *    anything else);
  *  - the layout is a pure function of the corpus (p04's deterministic
  *    packing), so a re-run writes byte-identical shard assignments —
  *    resumable, diffable, cache-friendly;
  *  - writing is one doc_id equi-join (plan × cleaned text) and one
  *    partitioned write — no extra shuffle beyond the partitionBy
  *    clustering.
  */
object CorpusShardSink {

  /** Write the cleaned, shard-partitioned corpus under `out`. */
  def write(s: SparkSession, dir: String, out: String): Unit = {
    val plan = Sampling.sequencePacking(s, dir)
      .select(col("doc_id"),
        expr(s"start_bin div ${Sampling.BinsPerShard}").as("shard_id"))
    Sampling.applyCuts(s, dir)
      .join(plan, "doc_id")
      .write.mode("overwrite")
      .partitionBy("lang", "shard_id")
      .option("compression", "zstd")
      .parquet(out)
  }

  /** Read back; (lang, shard_id) predicates become partition filters. */
  def read(s: SparkSession, out: String): DataFrame = s.read.parquet(out)

  /** True iff `df`'s scan prunes shard partitions (non-empty
    * PartitionFilters on the shard layout columns). */
  def prunesPartitions(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("PartitionFilters: [isnotnull(lang") ||
      plan.contains("PartitionFilters: [isnotnull(shard_id")
  }
}
