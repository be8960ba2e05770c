package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.{AnnQuery, IndexDeployment, StreamingSimScorer}

/** Blue/green rebuild — the executor of shouldRebuild's decision: a
  * degraded deployment rebuilds and atomically swaps; serving straddles
  * the swap without ever mixing generations; the decision flips back to
  * false once the quantizers are full-trained. */
class IndexDeploymentSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def answers(df: DataFrame) = df
    .select("qid", "rank", "neighbor_id", "cos_sim").collect()
    .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toSet

  /** The s17 situation on disk: gen 0's quantizers trained on the
    * pre-ingest members, serving the FULL grown corpus. */
  private def deployStale(root: String): Long = {
    val e = Similarity.embeddings(spark, sf)
    val stale = e.filter(col("vec_id") >= Similarity.NumQueries &&
      col("vec_id") % Similarity.IngestMod =!= Similarity.IngestRem)
    IndexDeployment.deploy(spark, train = stale, corpus = e, root)
  }

  test("recallLoss through the deployment equals the s17b audit; " +
      "rebuild executes, swaps, restores zero loss, flips the decision") {
    val root = Files.createTempDirectory("graft-bg").toString
    assert(IndexDeployment.currentGen(spark, root).isEmpty)
    assert(deployStale(root) == 0L)
    assert(IndexDeployment.currentGen(spark, root).contains(0L))

    // the deployment measurement IS the s17b audit's recall_delta
    val loss0 = IndexDeployment.recallLoss(spark, sf, root)
    val auditDelta = Similarity.ivfPqIngestRecall(spark, sf)
      .head().getAs[Double]("recall_delta")
    assert(math.abs(loss0 - (-auditDelta)) < 1e-12)

    // execute the decision (forced trigger — the s17 fixture's loss may
    // legitimately be 0 at this SF; the execution path is what's under
    // test, the decision arithmetic is spec'd at both polarities below)
    val rebuilt = IndexDeployment.rebuildIfNeeded(spark, sf, root,
      maxRecallLoss = -1.0)
    assert(rebuilt.contains(1L))
    assert(IndexDeployment.currentGen(spark, root).contains(1L))

    // post-swap: quantizers are full-trained — loss is exactly zero and
    // the default-budget decision flips back to false
    val loss1 = IndexDeployment.recallLoss(spark, sf, root)
    assert(math.abs(loss1) < 1e-12)
    assert(IndexDeployment.rebuildIfNeeded(spark, sf, root).isEmpty)
    assert(IndexDeployment.currentGen(spark, root).contains(1L),
      "a below-budget measurement must not deploy a generation")

    // post-swap serving ≡ a scratch-built index on the same corpus
    val queries = Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("embedding"))
    val viaDeployment = {
      val idx = IndexDeployment.loadGen(spark, root, 1L)
      try answers(StreamingSimScorer.serve(queries, idx))
      finally idx.unpersistAll()
    }
    val scratch = {
      // at the generation's recorded stride: the rebuild preserves gen
      // 0's K sizing (adaptive over the STALE training set), so the
      // scratch equivalent must build at that K, not re-derive its own
      val idx = StreamingSimScorer.buildIndexFrom(
        Similarity.embeddings(spark, sf),
        centroidStride = IndexDeployment.strideOf(spark, root, 1L))
      try answers(StreamingSimScorer.serve(queries, idx))
      finally idx.unpersistAll()
    }
    assert(scratch.nonEmpty && viaDeployment == scratch)
  }

  test("generation GC keeps the live and rollback window; rollback flips " +
      "the pointer atomically and serving follows, one generation per " +
      "batch") {
    val root = Files.createTempDirectory("graft-bg-gc").toString
    val e = Similarity.embeddings(spark, sf)
    // three generations on disk, live = 2
    (0 to 2).foreach(_ => IndexDeployment.deploy(spark, e, e, root))
    assert(IndexDeployment.generations(spark, root) == Seq(0L, 1L, 2L))
    assert(IndexDeployment.currentGen(spark, root).contains(2L))

    // keep=1 → the live gen plus ONE rollback target survive
    assert(IndexDeployment.gcGenerations(spark, root, keep = 1) == Seq(0L))
    assert(IndexDeployment.generations(spark, root) == Seq(1L, 2L))

    // serving across a ROLLBACK: each batch answered by one generation
    val qvecs = Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id") < Similarity.NumQueries)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AnnQuery]
    val base = Files.createTempDirectory("graft-bg-gc-out")
    val outDir = base.resolve("answers").toString
    val q = IndexDeployment.attach(input.toDF(), root, outDir,
      base.resolve("ckpt").toString)
    try {
      input.addData(qvecs.map { case (i, v) => AnnQuery(1000000L + i, v) }
        .toIndexedSeq)
      q.processAllAvailable()
      IndexDeployment.rollback(spark, root, 1L)
      assert(IndexDeployment.currentGen(spark, root).contains(1L))
      input.addData(qvecs.map { case (i, v) => AnnQuery(2000000L + i, v) }
        .toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val gens = spark.read.parquet(outDir).groupBy("batch_id")
      .agg(countDistinct(col("index_gen")).as("n"),
        max(col("index_gen")).as("g"))
      .collect().map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("g"))).toMap
    assert(gens == Map(0L -> (1L, 2L), 1L -> (1L, 1L)))

    // GC after the rollback: live is now 1 — it survives even at
    // keep=0; the higher-numbered 2 is the prunable one
    assert(IndexDeployment.gcGenerations(spark, root, keep = 0) == Seq(2L))
    assert(IndexDeployment.generations(spark, root) == Seq(1L))
    assert(IndexDeployment.currentGen(spark, root).contains(1L))

    // a rollback to a GC'd generation refuses instead of serving air
    intercept[IllegalArgumentException] {
      IndexDeployment.rollback(spark, root, 0L)
    }
    // and a fresh deploy after GC continues the generation sequence
    assert(IndexDeployment.deploy(spark, e, e, root) == 2L)
  }

  test("lifecycle loop closes on ONE index: CDC ingest+deletes maintain " +
      "the survivor view; measure → rebuild → swap serves exactly a " +
      "scratch build on the survivors") {
    import graft.streaming.StreamingIndexCdc
    val idx = StreamingSimScorer.buildIndex(spark, sf)
    try {
      val base = Files.createTempDirectory("graft-cdc-loop")
      val indexDir = base.resolve("index").toString
      val tombDir = base.resolve("tomb").toString
      val corpusDir = base.resolve("corpus").toString
      val root = base.resolve("gens").toString
      // the WHOLE embeddings table arrives through CDC (queries
      // included, so the NumQueries role convention holds on the
      // survivor view), then a delete feed removes a member slice
      val all = Tables.table(spark, sf, "embeddings")
        .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      var seq = 0L
      def nxt = { seq += 1; seq }
      def chg(rows: Seq[(Long, Long, String, Seq[Float])]) =
        rows.toDF("seq", "vec_id", "op", "embedding")
      val delIds = all.map(_._1)
        .filter(i => i >= Similarity.NumQueries && i % 9 == 4).toSet
      StreamingIndexCdc.applyBatch(
        chg(all.toSeq.map { case (i, v) => (nxt, i, "I", v) }),
        idx, indexDir, tombDir, 0L, Some(corpusDir))
      StreamingIndexCdc.applyBatch(
        chg(delIds.toSeq.map(i => (nxt, i, "D", Seq.empty[Float]))),
        idx, indexDir, tombDir, 1L, Some(corpusDir))
      val surv = StreamingIndexCdc.readSurvivors(spark, corpusDir, tombDir)
      assert(surv.select("vec_id").as[Long].collect().toSet ==
        all.map(_._1).toSet -- delIds)

      // gen 0: stale quantizers (trained on the survivor view MINUS the
      // ingest residue — the deployStale situation) over the survivors
      val survN = Similarity.withNorm(surv)
      IndexDeployment.deploy(spark,
        train = survN.filter(col("vec_id") >= Similarity.NumQueries &&
          col("vec_id") % Similarity.IngestMod =!= Similarity.IngestRem),
        corpus = survN, root)

      // measure over the MAINTAINED view → rebuild → swap (forced
      // trigger, as in the rebuild test: the execution path is what's
      // under test; the decision arithmetic is spec'd there)
      val rebuilt = IndexDeployment.rebuildFromCdc(spark, corpusDir,
        tombDir, root, maxRecallLoss = -1.0)
      assert(rebuilt.contains(1L))
      assert(IndexDeployment.currentGen(spark, root).contains(1L))
      // post-swap the quantizers are survivor-trained: loss exactly
      // zero over the same maintained view, and the loop settles
      assert(math.abs(IndexDeployment.recallLossOf(spark, survN, root))
        < 1e-12)
      assert(IndexDeployment
        .rebuildFromCdc(spark, corpusDir, tombDir, root).isEmpty)

      // post-swap serving ≡ a scratch build on the survivors
      val queries = survN.filter(col("vec_id") < Similarity.NumQueries)
        .select(col("vec_id").as("qid"), col("embedding"))
      val viaDeployment = {
        val g = IndexDeployment.loadGen(spark, root, 1L)
        try answers(StreamingSimScorer.serve(queries, g))
        finally g.unpersistAll()
      }
      // scratch build at the GENERATION's recorded stride: the rebuild
      // deliberately preserves gen 0's K sizing (never silently resizes
      // the index), so the equality must hold at that stride — the
      // adaptive default over survN would derive its own
      val scratch = answers(Similarity.ivfPqServe(queries, survN,
        Similarity.centsOf(survN,
          IndexDeployment.strideOf(spark, root, 1L)),
        Similarity.pqCodebook(survN)))
      assert(scratch.nonEmpty && viaDeployment == scratch)
      // a deleted vector can never be served through the swapped index
      val served = viaDeployment.map(_._3)
      assert(served.intersect(delIds).isEmpty)
    } finally idx.unpersistAll()
  }

  test("deploy after a rollback allocates a FRESH generation — never " +
      "overwriting the still-on-disk higher one in place") {
    val root = Files.createTempDirectory("graft-bg-rb").toString
    val e = Similarity.embeddings(spark, sf)
    (0 to 1).foreach(_ => IndexDeployment.deploy(spark, e, e, root))
    IndexDeployment.rollback(spark, root, 0L)
    // pointer+1 would be 1 — an extant rollback target whose five table
    // writes would be clobbered one-by-one; the allocator must skip past
    // every on-disk generation instead
    assert(IndexDeployment.deploy(spark, e, e, root) == 2L)
    assert(IndexDeployment.generations(spark, root) == Seq(0L, 1L, 2L))
    assert(IndexDeployment.currentGen(spark, root).contains(2L))
  }

  test("the PQ grid rides the generation: a 16-dim visual deploy serves " +
      "at its own geometry, rebuildFromCdc preserves it and refuses a " +
      "mid-stream survivor view") {
    import graft.operators.Multimodal
    import graft.streaming.StreamingIndexCdc
    val e = Similarity.withNorm(
      Multimodal.imageFeatures(spark, sf)).persist()
    val idx = StreamingSimScorer.buildIndexFrom(e,
      Multimodal.M11PqM, Multimodal.M11PqSubDim)
    try {
      val base = Files.createTempDirectory("graft-bg-grid")
      val indexDir = base.resolve("index").toString
      val tombDir = base.resolve("tomb").toString
      val corpusDir = base.resolve("corpus").toString
      val root = base.resolve("gens").toString
      val all = e.select("vec_id", "embedding")
        .as[(Long, Seq[Float])].collect().sortBy(_._1)
      var seq = 0L
      def nxt = { seq += 1; seq }
      def chg(rows: Seq[(Long, Long, String, Seq[Float])]) =
        rows.toDF("seq", "vec_id", "op", "embedding")
      // batch 0 arrives BEFORE the survivor view is enabled — the
      // mid-stream-enablement hazard the coverage guard exists for
      val (early, late) = all.splitAt(all.length / 2)
      StreamingIndexCdc.applyBatch(
        chg(early.toSeq.map { case (i, v) => (nxt, i, "I", v) }),
        idx, indexDir, tombDir, 0L, corpusDir = None)
      StreamingIndexCdc.applyBatch(
        chg(late.toSeq.map { case (i, v) => (nxt, i, "I", v) }),
        idx, indexDir, tombDir, 1L, Some(corpusDir))

      // gen 0 deployed at the VISUAL grid; the grid is recorded and
      // loadGen serves bit-identically to a scratch build at it
      IndexDeployment.deploy(spark, e, e, root,
        m = Multimodal.M11PqM, subDim = Multimodal.M11PqSubDim)
      assert(IndexDeployment.gridOf(spark, root, 0L) ==
        (Multimodal.M11PqM, Multimodal.M11PqSubDim))
      val queries = e.filter(col("vec_id") < Similarity.NumQueries)
        .select(col("vec_id").as("qid"), col("embedding"))
      val viaGen = {
        val g = IndexDeployment.loadGen(spark, root, 0L)
        try answers(StreamingSimScorer.serve(queries, g,
          excludeSelfIds = true))
        finally g.unpersistAll()
      }
      val scratch = answers(StreamingSimScorer.serve(queries, idx,
        excludeSelfIds = true))
      assert(scratch.nonEmpty && viaGen == scratch)
      // full-trained at its OWN grid: the measured loss is exactly zero
      // (at the 8×8 text default the 16-dim slices would be empty and
      // the measurement garbage)
      assert(math.abs(IndexDeployment.recallLossOf(spark, e, root))
        < 1e-12)

      // the survivor view misses batch 0's vectors — a rebuild on it
      // would silently drop them from serving; the guard refuses
      intercept[IllegalArgumentException] {
        IndexDeployment.rebuildFromCdc(spark, corpusDir, tombDir, root,
          maxRecallLoss = -1.0, indexDir = Some(indexDir))
      }

      // backfill the early vectors into the raw corpus, then the forced
      // rebuild runs — and the new generation KEEPS the visual grid
      StreamingIndexCdc.applyBatch(
        chg(early.toSeq.map { case (i, v) => (nxt, i, "I", v) }),
        idx, indexDir, tombDir, 2L, Some(corpusDir))
      val rebuilt = IndexDeployment.rebuildFromCdc(spark, corpusDir,
        tombDir, root, maxRecallLoss = -1.0, indexDir = Some(indexDir))
      assert(rebuilt.contains(1L))
      assert(IndexDeployment.gridOf(spark, root, 1L) ==
        (Multimodal.M11PqM, Multimodal.M11PqSubDim))
      val viaRebuilt = {
        val g = IndexDeployment.loadGen(spark, root, 1L)
        try answers(StreamingSimScorer.serve(queries, g,
          excludeSelfIds = true))
        finally g.unpersistAll()
      }
      assert(viaRebuilt == scratch)

      // version coverage, not bare existence: an UPDATE applied to the
      // index but skipped by the raw corpus (corpusDir=None for that
      // batch) leaves the survivor view holding a STALE embedding —
      // rebuilding on it would silently revert the vector in serving
      val someId = all.head._1
      StreamingIndexCdc.applyBatch(
        chg(Seq((nxt, someId, "I", all.head._2.map(_ + 1f)))),
        idx, indexDir, tombDir, 3L, corpusDir = None)
      intercept[IllegalArgumentException] {
        IndexDeployment.rebuildFromCdc(spark, corpusDir, tombDir, root,
          maxRecallLoss = -1.0, indexDir = Some(indexDir))
      }
    } finally { idx.unpersistAll(); e.unpersist(); () }
  }

  test("rollback refuses a crashed deploy's partial generation dir") {
    val root = Files.createTempDirectory("graft-bg-partial").toString
    val e = Similarity.embeddings(spark, sf)
    IndexDeployment.deploy(spark, e, e, root)
    // simulate a deploy that died after creating the dir (GRID written,
    // tables missing): bare existence must not qualify it for serving
    val partial = java.nio.file.Paths.get(root, "gen=7")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.writeString(partial.resolve("GRID"), "8 8\n")
    intercept[IllegalArgumentException] {
      IndexDeployment.rollback(spark, root, 7L)
    }
    // the complete generation still rolls back fine
    IndexDeployment.rollback(spark, root, 0L)
    assert(IndexDeployment.currentGen(spark, root).contains(0L))

    // GC: the partial can neither occupy a rollback slot nor be
    // deleted (it is indistinguishable from a build in flight) — the
    // keep-window ranges over COMPLETE generations only
    val gen8 = IndexDeployment.deploy(spark, e, e, root) // becomes live
    assert(gen8 == 8L) // allocated past the partial, never into it
    assert(IndexDeployment.gcGenerations(spark, root, keep = 1).isEmpty,
      "gen=0 is the one complete rollback target; the partial must not " +
        "push it out of the window")
    assert(IndexDeployment.gcGenerations(spark, root, keep = 0) == Seq(0L))
    assert(IndexDeployment.generations(spark, root) == Seq(7L, 8L),
      "live and the (undeletable) partial remain")
  }

  test("serving across the swap: every batch answered by exactly one " +
      "generation, each matching that generation's own index") {
    val root = Files.createTempDirectory("graft-bg-swap").toString
    deployStale(root)

    val qvecs = Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id") < Similarity.NumQueries)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val batch1 = qvecs.map { case (i, v) => AnnQuery(1000000L + i, v) }
    val batch2 = qvecs.map { case (i, v) => AnnQuery(2000000L + i, v) }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AnnQuery]
    val base = Files.createTempDirectory("graft-bg-out")
    val outDir = base.resolve("answers").toString
    val q = IndexDeployment.attach(input.toDF(), root, outDir,
      base.resolve("ckpt").toString)
    try {
      input.addData(batch1.toIndexedSeq); q.processAllAvailable()
      // the swap happens BETWEEN micro-batches, while the query is live
      val e = Similarity.embeddings(spark, sf)
      IndexDeployment.deploy(spark, train = e, corpus = e, root)
      input.addData(batch2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(outDir)
    // one generation per micro-batch — a swap never splits a batch
    val gens = out.groupBy("batch_id")
      .agg(countDistinct(col("index_gen")).as("n"),
        max(col("index_gen")).as("g"))
      .collect().map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("g"))).toMap
    assert(gens == Map(0L -> (1L, 0L), 1L -> (1L, 1L)))

    // each batch's answers equal serving through its OWN generation
    def expect(gen: Long, qs: Array[AnnQuery]) = {
      val idx = IndexDeployment.loadGen(spark, root, gen)
      try answers(StreamingSimScorer.serve(
        qs.toSeq.toDF("qid", "embedding"), idx))
      finally idx.unpersistAll()
    }
    assert(answers(out.filter(col("batch_id") === 0L)) ==
      expect(0L, batch1))
    assert(answers(out.filter(col("batch_id") === 1L)) ==
      expect(1L, batch2))
  }

  test("centroid stride is a deployment knob: a custom-K deploy serves " +
      "like a scratch build at that stride, measures zero loss when " +
      "full-trained, and a rebuild preserves the stride") {
    val root = Files.createTempDirectory("graft-bg-stride").toString
    val e = Similarity.embeddings(spark, sf)
    // an explicit pinned stride (the legacy constant halved) — distinct
    // from what the adaptive default would derive, so the test proves
    // the KNOB is honored, recorded, and preserved end-to-end
    val stride = Similarity.CentroidStride / 2
    assert(IndexDeployment.deploy(spark, e, e, root,
      centroidStride = stride) == 0L)
    assert(IndexDeployment.strideOf(spark, root, 0L) == stride)
    assert(IndexDeployment.gridOf(spark, root, 0L) ==
      (Similarity.PqM, Similarity.PqSubDim))
    val queries = e.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("embedding"))
    val viaGen = {
      val g = IndexDeployment.loadGen(spark, root, 0L)
      try answers(StreamingSimScorer.serve(queries, g,
        excludeSelfIds = true))
      finally g.unpersistAll()
    }
    val scratch = StreamingSimScorer.buildIndexFrom(e,
      centroidStride = stride)
    try assert(viaGen.nonEmpty &&
      viaGen == answers(StreamingSimScorer.serve(queries, scratch,
        excludeSelfIds = true)))
    finally scratch.unpersistAll()
    // K changes the IVF partitioning, so a wrong-stride baseline would
    // measure phantom loss — full-trained at its OWN stride is exact 0
    assert(math.abs(IndexDeployment.recallLoss(spark, sf, root)) < 1e-12)
    // a forced rebuild must keep the deployment's K sizing
    assert(IndexDeployment.rebuildIfNeeded(spark, sf, root,
      maxRecallLoss = -1.0).contains(1L))
    assert(IndexDeployment.strideOf(spark, root, 1L) == stride)
  }

  test("three-space isolation: concurrent text/visual/audio deployments " +
      "each serve at their own grid; rollback and GC on one space leave " +
      "the others' serving byte-identical") {
    import graft.operators.Multimodal
    val base = Files.createTempDirectory("graft-bg-3space")
    // one deployment root per vector space — text at the 8×8 default
    // grid, visual and audio at the 4×4 media grid, all sharing the
    // SAME machinery (loadGen, pointer, GC) in one session: any static
    // state in the artifact cache or pointer handling would cross-talk
    val spaces: Seq[(String, DataFrame, Int, Int)] = Seq(
      ("text", Similarity.embeddings(spark, sf),
        Similarity.PqM, Similarity.PqSubDim),
      ("visual", Similarity.withNorm(Multimodal.imageFeatures(spark, sf)),
        Multimodal.M11PqM, Multimodal.M11PqSubDim),
      ("audio", Similarity.withNorm(Multimodal.audioFeatures(spark, sf)),
        Multimodal.M11PqM, Multimodal.M11PqSubDim))
    val roots = spaces.map { case (name, _, _, _) =>
      name -> base.resolve(name).toString
    }.toMap
    def serveNow(name: String): Set[(Long, Int, Long, Double)] = {
      val (_, e, _, _) = spaces.find(_._1 == name).get
      val queries = e.filter(col("vec_id") < Similarity.NumQueries)
        .select(col("vec_id").as("qid"), col("embedding"))
      val g = IndexDeployment.loadGen(spark, roots(name),
        IndexDeployment.currentGen(spark, roots(name)).get)
      try answers(StreamingSimScorer.serve(queries, g,
        excludeSelfIds = true))
      finally g.unpersistAll()
    }
    // interleaved deploys (not one space at a time): the deploy of one
    // space runs BETWEEN another's deploy and its first serve
    spaces.foreach { case (name, e, m, subDim) =>
      assert(IndexDeployment.deploy(spark, e, e, roots(name),
        m = m, subDim = subDim) == 0L)
    }
    val baseline = spaces.map { case (name, _, _, _) =>
      name -> serveNow(name)
    }.toMap
    assert(baseline.values.forall(_.nonEmpty))
    spaces.foreach { case (name, _, m, subDim) =>
      assert(IndexDeployment.gridOf(spark, roots(name), 0L) == (m, subDim))
    }

    // text gets a second generation, rolls back to gen 0, and GC drops
    // the non-live gen 1 — a full lifecycle churn on ONE space
    val eText = spaces.head._2
    assert(IndexDeployment.deploy(spark, eText, eText, roots("text")) == 1L)
    IndexDeployment.rollback(spark, roots("text"), 0L)
    assert(IndexDeployment.currentGen(spark, roots("text")).contains(0L))
    assert(IndexDeployment.gcGenerations(spark, roots("text"), keep = 0)
      == Seq(1L))

    // the churned space serves its rollback target; the OTHER spaces
    // still serve gen 0 with byte-identical answers at their own grids
    spaces.foreach { case (name, _, m, subDim) =>
      assert(IndexDeployment.currentGen(spark, roots(name)).contains(0L))
      assert(IndexDeployment.gridOf(spark, roots(name), 0L) == (m, subDim))
      assert(serveNow(name) == baseline(name),
        s"space '$name' serving changed after text-space rollback+GC")
    }
  }
}
