package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Empirical scale-trend check: synthesize a `factor`× corpus from the
  * sf0.1 fixture (own shape-preserving transform, own directory — the
  * driver corpus is read-only) and run the most expensive queries once
  * at both scales, reporting per-query wall ratios and plan-shape flips.
  * The point is evidence for the 100 TB story: a query whose cost is
  * designed linear-in-corpus should land near `factor`× (modulo fixed
  * overheads, which push ratios BELOW factor at these sizes); anything
  * far above says a hidden superlinear term or a strategy flip
  * (broadcast→sort-merge on a dim, a lost pushdown) needs a look.
  *
  * Corpus synthesis (deterministic, seed-free): `factor` replicas of
  * every fact table with disjoint key ranges (per-domain offsets, so FK
  * joins stay consistent: replica r of orders references replica r of
  * customer), dimensions (`region`/`nation`) kept fixed like TPC-H
  * does. Content perturbation keeps per-replica structure identical
  * while preventing cross-replica accidental structure:
  *
  *  - `documents.text`: per-replica rotation of the 26-letter
  *    lowercase alphabet (`translate`) — length-preserving and
  *    injective per replica, so in-replica near-dup pairs keep their
  *    exact jaccard, while a doc shares (almost) no shingles with its
  *    other replicas (rotation period 26 ≥ factor), so pair counts
  *    grow ∝ factor, not factor². (Digits/punctuation replicate
  *    verbatim — residual cross-replica shingle overlap is noise,
  *    not structure.)
  *  - `embeddings.embedding`: per-replica cyclic rotation of the float
  *    array — norm-preserving, distributionally identical, yet replicas
  *    are distinct points, so ANN candidate structure grows linearly.
  *  - `customer.c_name`: per-replica digit rotation — the ER blocking
  *    prefix survives (blocks grow ∝ factor, the honest semantics of
  *    name-blocked ER) while keys inside the name change.
  *
  * Queries with inherently superlinear semantics (q67-style Σ block²
  * fuzzy joins) are excluded by default — their scaling law is by
  * design and measured elsewhere (the occupancy-probed grid specs);
  * this study targets the queries CLAIMED linear.
  *
  * Usage: runMain graft.tools.ScaleTrend [srcDir] [outDir] [factor]
  *        [comma-separated query names]
  */
object ScaleTrend {

  /** Per-domain key offset: max key + 1, rounded up to a power of 10 so
    * replica ids are legible in failures. */
  private def offsetOf(df: DataFrame, key: String): Long = {
    val mx = df.agg(max(col(key))).head().getLong(0)
    var off = 10L
    while (off <= mx) off *= 10
    off
  }

  private def rotStr(alphabet: String, r: Int): String = {
    val k = ((r % alphabet.length) + alphabet.length) % alphabet.length
    alphabet.drop(k) + alphabet.take(k)
  }

  def synthesize(s: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    // every per-replica perturbation must be injective ACROSS replicas
    // or replicas alias byte-identically and the linearity argument
    // breaks: the c_name digit rotation has period 10 (the letter
    // rotation 26, the embedding rotation dim ≥ 16), so 10 is the cap
    require(factor >= 1 && factor <= 10,
      s"factor must be in [1, 10] (digit-rotation period), got $factor")
    def tbl(n: String): DataFrame =
      s.read.parquet(s"$srcDir/$n.parquet")
    val custOff = offsetOf(tbl("customer"), "c_custkey")
    val ordOff = offsetOf(tbl("orders"), "o_orderkey")
    val partOff = offsetOf(tbl("part"), "p_partkey")
    val suppOff = offsetOf(tbl("supplier"), "s_suppkey")
    val docOff = offsetOf(tbl("documents"), "doc_id")
    val vecOff = offsetOf(tbl("embeddings"), "vec_id")
    val evOff = offsetOf(tbl("events"), "event_id")
    val userOff = offsetOf(tbl("events"), "user_id")
    val digits = "0123456789"
    val letters = "abcdefghijklmnopqrstuvwxyz"

    def replicate(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = tbl(name)
      (0 until factor).map(r => f(base, r)).reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      ()
    }
    // fixed dimensions: copied once, like TPC-H's constant region/nation
    Seq("region", "nation").foreach { n =>
      tbl(n).write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }
    replicate("customer") { (df, r) =>
      df.select(
        (col("c_custkey") + lit(r * custOff)).as("c_custkey"),
        translate(col("c_name"), digits, rotStr(digits, r)).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }
    replicate("supplier") { (df, r) =>
      df.select((col("s_suppkey") + lit(r * suppOff)).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal"))
    }
    replicate("part") { (df, r) =>
      df.select((col("p_partkey") + lit(r * partOff)).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
    }
    replicate("orders") { (df, r) =>
      df.select((col("o_orderkey") + lit(r * ordOff)).as("o_orderkey"),
        (col("o_custkey") + lit(r * custOff)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }
    replicate("lineitem") { (df, r) =>
      df.select((col("l_orderkey") + lit(r * ordOff)).as("l_orderkey"),
        (col("l_partkey") + lit(r * partOff)).as("l_partkey"),
        (col("l_suppkey") + lit(r * suppOff)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }
    replicate("events") { (df, r) =>
      df.select((col("event_id") + lit(r * evOff)).as("event_id"),
        col("ts"), (col("user_id") + lit(r * userOff)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    replicate("documents") { (df, r) =>
      df.select((col("doc_id") + lit(r * docOff)).as("doc_id"),
        translate(col("text"), letters, rotStr(letters, r)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    replicate("embeddings") { (df, r) =>
      val dim = size(col("embedding"))
      val k = lit(r) % dim
      val rotated = when(k === 0, col("embedding"))
        .otherwise(concat(
          slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), lit(1), k)))
      df.select((col("vec_id") + lit(r * vecOff)).as("vec_id"),
        rotated.as("embedding"), col("label"))
    }
  }

  /** The default study set: the 10 most expensive bench queries (r11
    * medians), all claimed corpus-linear in their scaladocs. */
  val DefaultQueries: Seq[String] = Seq(
    "d09_shingle_audit_suite", "s21_filtered_ann_audit",
    "s21c_filtered_artifacts", "q44_series_topk",
    // q44's clustered sibling rides the study to demonstrate the
    // subquadratic path beside the exact one (N^1.5 vs N²/24)
    "q44b_series_topk_clustered",
    "d13_dedup_recall_eval", "d05_dedup_embedding",
    "d04_dedup_ngram_jaccard", "d19_dedup_method_agreement",
    "m11_visual_ann", "m12_visual_dup_recall")

  private def run(s: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(s, dir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-scale/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val names = if (args.length > 3) args(3).split(",").toSeq
      else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val done = Paths.get(s"$outDir/_DONE_x$factor")
    if (!Files.exists(done)) {
      println(s"[scaletrend] synthesizing ${factor}x corpus at $outDir")
      synthesize(spark, srcDir, outDir, factor)
      Files.createDirectories(done.getParent)
      Files.write(done, Array.emptyByteArray)
    } else println(s"[scaletrend] reusing corpus at $outDir")

    // codegen warmup (the Bench protocol) + deploy-time artifact
    // publication at BOTH scales, so neither one-time cost lands in a
    // measured single run
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    Seq(srcDir, outDir).foreach { d =>
      try graft.operators.Similarity.publishArtifacts(spark, d)
      catch { case e: Throwable =>
        System.err.println(s"[scaletrend] publishArtifacts($d): ${e.getMessage}")
      }
    }

    final case class Row(name: String, small: Double, big: Double,
      planSmall: PlanAudit.Audit, planBig: PlanAudit.Audit)
    val rows = names.map { n =>
      // plan audits run with capture ON (to fold the checkpointed
      // internal pipelines in), the timed runs with capture OFF — a
      // capture-instrumented materialization would otherwise pay a
      // full explain("formatted") inside the measured window, biasing
      // exactly the study's target queries
      def auditOf(dir: String): PlanAudit.Audit = {
        graft.plans.PlanCapture.enable()
        try {
          val a = PlanAudit.audit(n, graft.plans.PlanCapture
            .explainText(SparkEntry.queries(n)(spark, dir)))
          val inner = graft.plans.PlanCapture.drain()
            .map { case (l, t) => PlanAudit.audit(s"$n/$l", t) }
          inner.foldLeft(a)((acc, i) => acc.copy(
            shuffles = acc.shuffles + i.shuffles,
            broadcasts = acc.broadcasts + i.broadcasts,
            scans = acc.scans ++ i.scans))
        } finally graft.plans.PlanCapture.disable()
      }
      val pSmall = auditOf(srcDir)
      val tSmall = run(spark, n, srcDir)
      val pBig = auditOf(outDir)
      val tBig0 = run(spark, n, outDir)
      // confirm-before-flagging: ONE cold big-corpus run can overstate
      // a ratio ~2× (first-touch page cache, one-off AQE choices — d05
      // measured 55 s cold vs 23 s steady in the same session), so a
      // ratio that trips the flag earns a second run and the MIN
      // stands; sub-flag ratios stay single-run (the cheap common case)
      val tBig =
        if (tBig0 / tSmall > 1.5 * factor)
          math.min(tBig0, run(spark, n, outDir))
        else tBig0
      println(f"[scaletrend] $n: $tSmall%.2f s -> $tBig%.2f s " +
        f"(x${tBig / tSmall}%.1f)" +
        (if (tBig != tBig0) f" [confirmed; first run $tBig0%.2f s]" else ""))
      Row(n, tSmall, tBig, pSmall, pBig)
    }

    val sb = new StringBuilder
    sb ++= "# SCALETREND — empirical 10× scale check\n\n"
    sb ++= s"`graft.tools.ScaleTrend`: the ${names.size} most expensive " +
      s"bench queries run once at sf0.1 (`$srcDir`) and once at a " +
      s"synthesized ${factor}× corpus (`$outDir`; shape-preserving " +
      "replication — see the tool's scaladoc for the transform and why " +
      "pair-generating structure grows linearly). Single runs at " +
      s"local[$cpus] with AQE on, codegen pre-warmed, quantizer " +
      "artifacts pre-published at both scales (deploy-time rule); " +
      "wall ratios carry single-run noise (±10-20%), which is enough " +
      "to separate ≈linear from superlinear.\n\n"
    sb ++= "Reading: fixed per-query overhead (planning, artifact reads," +
      " the fixed ANN query set) pushes ratios BELOW the data factor; " +
      s"a ratio well ABOVE $factor (>1.5×factor) flags a superlinear " +
      "term or a plan flip. `plan Δ` lists shuffle/broadcast count " +
      "changes between scales — `bcast N→M` with M<N on a dimension " +
      "join would be a broadcast→sort-merge flip (none expected: dims " +
      "are fixed-size).\n\n"
    sb ++= s"| query | sf0.1 s | ${factor}× s | ratio | plan Δ (small→big) |\n"
    sb ++= "|---|---|---|---|---|\n"
    rows.foreach { r =>
      val flag = if (r.big / r.small > 1.5 * factor) " ⚠" else ""
      val d = Seq(
        if (r.planSmall.shuffles != r.planBig.shuffles)
          Some(s"shuffles ${r.planSmall.shuffles}→${r.planBig.shuffles}")
        else None,
        if (r.planSmall.broadcasts != r.planBig.broadcasts)
          Some(s"bcast ${r.planSmall.broadcasts}→${r.planBig.broadcasts}")
        else None).flatten
      val delta = if (d.isEmpty) "none" else d.mkString(", ")
      sb ++= f"| ${r.name} | ${r.small}%.2f | ${r.big}%.2f | " +
        f"x${r.big / r.small}%.1f$flag | $delta |\n"
    }
    sb ++= Findings
    val out = if (args.length > 4) args(4) else "SCALETREND.md"
    Files.write(Paths.get(out),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[scaletrend] wrote $out")
    spark.stop()
  }

  /** Root-caused analysis of the flagged ratios — rides the generated
    * file so a regeneration keeps the findings beside the numbers. */
  private val Findings: String = """
## Findings (root-caused; ratios vary ±20-30% run-to-run at the big
## corpus — flagged ratios are confirmed by a second run, MIN stands)

- **q44_series_topk ~×95-105 — superlinear BY SEMANTICS, and the
  measured ratio validates its documented cost model.** q44 is exact
  all-pairs cosine top-3 within peak-hour bands: users grow 10×
  (replicated with fresh ids), so within-band pairs grow ~100× —
  observed right at it on every run. Exact banded all-pairs is
  quadratic the way q67's Σ block² fuzzy join is; the salts² grid
  decomposition bounds any one shuffle cell at (n_b/salts)² (parallel,
  spill-safe), it does not change the total. The subquadratic
  alternative is the ANN path (s-family), which trades exactness — q44
  exists to be the exact oracle-checkable variant, and
  **q44b_series_topk_clustered is that alternative shipped**: the same
  scoring over within-cluster candidates only (argmax-cosine assignment
  to a centroid sample, the SemDeDup/IVF recipe on series), measuring
  ~×37-40 at 10× against q44's ~×100 on the same corpus (≈2.2× faster
  at one decade, e.g. 350 s vs 166 s). Candidates are bounded by
  stride·N (linear); the remaining superlinear term is the N·K
  assignment at the oracle-pinned fixture stride — q44b takes the
  stride as a parameter, so an operator holds K ≈ √N per decade (the
  deploy-knob rule) and the whole query stays N^1.5.

- **m11_visual_ann / m12_visual_dup_recall ~×20-37 — the flat centroid
  stride makes K ∝ N.** `Similarity.CentroidStride` is a constant, so
  the IVF coarse-quantizer sample grows with the corpus and the N·K
  nearest-centroid assignment is N²/stride: ×100 at 10× data, blended
  with the ×10 linear decode/featurize into the observed ratio. The
  fixture queries keep the oracle-pinned stride by design; the scale
  lever shipped with this study is `centroidStride` on
  `IndexDeployment.deploy` (recorded per generation in the GRID file,
  preserved by rebuilds/rollbacks, spec-proven to serve identically to
  a scratch build at that stride) — a real deployment sizes K ≈ √N,
  making assignment N^1.5 and the probed fraction NProbe/√N.

- **d19_dedup_method_agreement ~×15 — same K ∝ N term through
  SemDeDup.** Its semantic side assigns every vector to the nearest of
  N/stride coarse centroids (`semCore`); the LSH side is linear. The
  deploy-stride knob is the same remedy when the SemDeDup quantizer is
  shared with a deployed index.

- **d05_dedup_embedding is linear (~×8-10 steady-state)** — and it is
  also the case study for the confirm rule: one cold big-corpus run
  measured 55 s where the same session's steady state is 23 s
  (first-touch page cache), which would have flagged a linear operator
  as superlinear.

- **Everything else lands at ×2–×3 — sublinear, as designed.** Fixed
  ANN query sets, broadcast dimensions, banded/bucketed pair
  generation, and per-query planning overheads amortize; no
  broadcast→sort-merge flips appeared anywhere (dimensions are
  fixed-size and stayed broadcast).
"""
}
