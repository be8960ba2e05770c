package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupDeployment}

/** The PLANES deployment artifact (r15): the embedding-LSH planes knob
  * recorded beside the corpus — the GRID-file discipline applied to
  * dedup, so an operator-chosen P survives restarts instead of dying
  * with the session. */
class DedupDeploymentSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-dedup-deploy").toString

  test("no record: nearDupPairs is the adaptive d05, byte-identical") {
    val root = freshRoot()
    assert(DedupDeployment.recordedEmbPlanes(spark, root).isEmpty)
    val got = DedupDeployment.nearDupPairs(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Dedup.embeddingCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, "default (unpinned) path must be the oracle path")
  }

  test("record → restart → banding runs at the recorded P") {
    val root = freshRoot()
    DedupDeployment.recordEmbPlanes(spark, root, 6)
    // a RESTART is a fresh read of the artifact: recordedEmbPlanes keeps
    // no session state, so a new call IS the restart path
    assert(DedupDeployment.recordedEmbPlanes(spark, root) == Some(6))
    val pinned = DedupDeployment.nearDupPairs(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val at6 = Dedup.embeddingCosineAt(spark, sf, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pinned == at6, "deployment must band at the recorded P")
    // and the pinned geometry genuinely differs from the adaptive floor
    // in candidate space: 6-plane buckets are 6 bits wide
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val widths = Dedup.embBandKeys(e, 6)
      .select(length(col("bucket"))).distinct().as[Int].collect().toSeq
    assert(widths == Seq(6))
  }

  test("re-record overwrites atomically; out-of-range rejected") {
    val root = freshRoot()
    DedupDeployment.recordEmbPlanes(spark, root, 5)
    DedupDeployment.recordEmbPlanes(spark, root, 8)
    assert(DedupDeployment.recordedEmbPlanes(spark, root) == Some(8))
    intercept[IllegalArgumentException] {
      DedupDeployment.recordEmbPlanes(spark, root, 0)
    }
    intercept[IllegalArgumentException] {
      DedupDeployment.recordEmbPlanes(spark, root, Dedup.EmbPlanesMax + 1)
    }
    assert(DedupDeployment.recordedEmbPlanes(spark, root) == Some(8),
      "a rejected record must not clobber the artifact")
  }

  test("maintenanceRun: a pre-recorded P GOVERNS the pipeline-shaped " +
      "run (honored, not re-sized); first run sizes once and persists") {
    // operator pinned P=3 from the d26 curve; the maintenance pass must
    // band at 3 even though the instrument would recommend otherwise
    val root = freshRoot()
    DedupDeployment.recordEmbPlanes(spark, root, 3)
    val (p, pairs) = DedupDeployment.maintenanceRun(spark, sf, root)
    assert(p == 3, "maintenance re-sized over an operator-pinned P")
    assert(DedupDeployment.recordedEmbPlanes(spark, root) == Some(3),
      "maintenance must not rewrite the pinned artifact")
    val want = Dedup.embeddingCosineAt(spark, sf, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == want,
      "pinned P must govern the maintenance pass's banding")
    // fresh deployment: the first maintenance run sizes with the d26
    // instrument and persists its pick — the restart then honors it
    val root2 = freshRoot()
    val (p2, _) = DedupDeployment.maintenanceRun(spark, sf, root2)
    assert(DedupDeployment.recordedEmbPlanes(spark, root2) == Some(p2),
      "first maintenance run must persist the sized P")
    val (p3, _) = DedupDeployment.maintenanceRun(spark, sf, root2)
    assert(p3 == p2, "restarted maintenance must read, not re-size")
  }

  test("sizeAndRecord records the d26 recommendation (sampled instrument)") {
    val root = freshRoot()
    val p = DedupDeployment.sizeAndRecord(spark, sf, root)
    assert(DedupDeployment.recordedEmbPlanes(spark, root) == Some(p))
    val want = Dedup.embPlanesSweepSampled(spark, sf)
      .filter(col("recommended")).head().getAs[Int]("planes")
    assert(p == want, "recorded value must be the instrument's pick")
  }
}
