package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sinks.CorpusShardSink

/** The shard writer must ship exactly the layout its own manifest plans:
  * same (lang, shard) population AND token masses, prunable directories,
  * cleaned text. */
class CorpusShardSinkSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("written shards match the manifest exactly and prune on read") {
    val out = Files.createTempDirectory("graft-shards").toString
    CorpusShardSink.write(spark, sf, out)

    val back = CorpusShardSink.read(spark, out)
    // every document lands exactly once
    assert(back.count() == Tables.table(spark, sf, "documents").count())

    // per-(lang, shard) doc counts AND token masses equal the manifest —
    // the sink packs the cleaned corpus it ships, so plan and artifact
    // cannot disagree (the p16-vs-d17 consistency contract, for shards)
    val got = back.groupBy("lang", "shard_id")
      .agg(count(lit(1)).as("n"), sum(col("n_tokens_clean")).as("mass"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard_id")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("mass"))).toMap
    val planned = CorpusShardSink.manifest(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(got == planned,
      s"shard artifact diverges from its manifest: got=$got planned=$planned")

    // a single-shard read prunes directories…
    val one = planned.keys.head
    val pruned = back.where(col("lang") === one._1 &&
      col("shard_id") === one._2)
    assert(CorpusShardSink.prunesPartitions(pruned),
      "shard predicate must become a PartitionFilter:\n" +
        pruned.queryExecution.executedPlan.toString)
    assert(pruned.count() == planned(one)._1)
    // …and an isnotnull-only predicate does NOT count as pruning
    assert(!CorpusShardSink.prunesPartitions(
      back.where(col("lang").isNotNull)))
    // an AQE-wrapped plan (aggregate above the scan) must still expose
    // its pruning — AdaptiveSparkPlanExec hides scans from plain collect
    val aqeOn = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val agg = CorpusShardSink.read(spark, out)
        .where(col("lang") === one._1 && col("shard_id") === one._2)
        .groupBy("lang").count()
      agg.collect() // materialize so the adaptive plan is finalized
      assert(CorpusShardSink.prunesPartitions(agg),
        "pruning invisible through AdaptiveSparkPlanExec:\n" +
          agg.queryExecution.executedPlan.toString)
    } finally {
      aqeOn.foreach(spark.conf.set("spark.sql.adaptive.enabled", _))
    }

    // the shipped text is the CLEANED corpus (p16), not the raw one
    val cleanMass = Sampling.applyCuts(spark, sf)
      .agg(sum(col("n_tokens_clean"))).head().getLong(0)
    val shippedMass = back.agg(sum(col("n_tokens_clean"))).head().getLong(0)
    assert(shippedMass == cleanMass)
  }
}
