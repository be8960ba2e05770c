package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomPrune

/** Bloom-prune correctness: no false negatives (pruned join ≡ plain
  * join), real selectivity on a sparse key set, and sane degenerate
  * behavior. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("pruned join is row-identical to the plain join on a sparse build side") {
    // sparse build side: one customer in 50 — the shape where a bloom
    // prune pays (dim too big to trust broadcast, key set still tiny)
    val build = Tables.table(spark, sf, "customer")
      .filter(col("c_custkey") % 50 === 0)
      .select(col("c_custkey"), col("c_name"))
    val probe = Tables.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val nKeys = build.count()

    val plain = probe.join(build, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toString).sorted.toSeq
    val pruned = BloomPrune
      .prunedJoin(probe, "o_custkey", build, "c_custkey", nKeys)
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toString).sorted.toSeq
    assert(plain.nonEmpty && pruned == plain)
  }

  test("the filter actually prunes: survivors are close to true joiners") {
    val build = Tables.table(spark, sf, "customer")
      .filter(col("c_custkey") % 50 === 0).select("c_custkey")
    val probe = Tables.table(spark, sf, "orders").select("o_custkey")
    val bloom = BloomPrune.buildFilter(build, "c_custkey", build.count())
    val total = probe.count()
    val kept = BloomPrune.semiPrune(probe, "o_custkey", bloom).count()
    val truth = probe.join(build,
      col("o_custkey") === col("c_custkey"), "left_semi").count()
    // every true joiner survives (no false negatives)...
    assert(kept >= truth)
    // ...and the false-positive tail stays within ~1% of the pruned mass
    // at 23 bits/key (generous 5% bound for a tiny filter)
    assert(kept - truth <= math.max(5L, (total * 5) / 100),
      s"kept=$kept truth=$truth total=$total")
    assert(kept < total / 2, "a 1-in-50 key set must prune most rows")
  }

  test("buildFilter restores the session's runtime-bloom sizing confs") {
    // advisor r8: a large expectedKeys raise must not leak into the caps
    // that size Spark's own auto-injected runtime bloom filters
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prevItems = spark.conf.get(itemsKey, "4000000")
    val prevBits = spark.conf.get(bitsKey, "67108864")
    val build = Tables.table(spark, sf, "customer").select("c_custkey")
    // 5M keys exceeds both default caps (4M items / 64M bits) so both
    // raises fire, while the bitmap stays a test-sized ~14 MB
    val bloom = BloomPrune.buildFilter(build, "c_custkey", 5_000_000L)
    assert(bloom != null)
    assert(spark.conf.get(itemsKey, "4000000") == prevItems)
    assert(spark.conf.get(bitsKey, "67108864") == prevBits)
  }

  test("d07b: bloom-pruned incremental ingest equals the plain d07 path") {
    import graft.operators.Dedup
    val plain = Dedup.incremental(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val bloomed = Dedup.incremental(spark, sf, bloomPruneIndex = true)
      .collect().map(_.toString).sorted.toSeq
    assert(plain.nonEmpty && bloomed == plain)
  }

  test("empty build side yields an empty pruned join, not a crash") {
    val build = Tables.table(spark, sf, "customer")
      .filter(col("c_custkey") < 0).select("c_custkey")
    val probe = Tables.table(spark, sf, "orders").select("o_custkey")
    val bloom = BloomPrune.buildFilter(build, "c_custkey", 1L)
    assert(bloom == null)
    assert(BloomPrune.semiPrune(probe, "o_custkey", bloom).count() == 0)
  }
}
