package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.ops.CorpusCount

/** The corpus-adaptive embedding-LSH geometry (r14): the plane ladder's
  * integer rungs, the prefix-stability the DuckDB oracle's truncation
  * replay relies on, the legacy slot mapping that keeps floor-geometry
  * buckets bit-identical to the pre-adaptive engine, and the memoized
  * corpus count all the adaptive derivations share. */
class AdaptiveGeometrySpec extends SparkSpec {
  import spark.implicits._

  test("plane ladder: floor at fixture scale, +1 plane per corpus doubling, capped") {
    // T = 125: the bench corpus (sf0.1, N = 2000 = 125·2^4) sits exactly
    // at the floor's saturation edge
    assert(Dedup.adaptiveEmbPlanes(1) == Dedup.EmbPlanesPerBand)
    assert(Dedup.adaptiveEmbPlanes(500) == 4)   // sf0.01
    assert(Dedup.adaptiveEmbPlanes(2000) == 4)  // sf0.1 — floor, bit-identical bench
    assert(Dedup.adaptiveEmbPlanes(2001) == 5)
    assert(Dedup.adaptiveEmbPlanes(5000) == 6)  // the oracle-crosschecked 10× rung
    assert(Dedup.adaptiveEmbPlanes(20000) == 8) // sf0.1 × 10
    assert(Dedup.adaptiveEmbPlanes(40000) == 9) // sf0.1 × 20
    assert(Dedup.adaptiveEmbPlanes(Long.MaxValue) == Dedup.EmbPlanesMax)
    // the ladder's invariant: expected per-bucket occupancy ≤ T below the cap
    Seq(3000L, 12345L, 999999L).foreach { n =>
      val p = Dedup.adaptiveEmbPlanes(n)
      assert(n <= (Dedup.EmbTargetOccupancy << p), s"occupancy overshoot at $n")
      if (p > Dedup.EmbPlanesPerBand)
        assert(n > (Dedup.EmbTargetOccupancy << (p - 1)), s"over-provisioned at $n")
    }
  }

  test("legacy slots: floor planes keep their r13 flat indices, extensions are fresh and injective") {
    for (b <- 0 until Dedup.EmbBands; p <- 0 until Dedup.EmbPlanesPerBand)
      assert(Dedup.embPlaneSlot(b, p) == b * Dedup.EmbPlanesPerBand + p)
    val all = for (b <- 0 until Dedup.EmbBands; p <- 0 until Dedup.EmbPlanesMax)
      yield Dedup.embPlaneSlot(b, p)
    assert(all.distinct.size == all.size, "slot collision would reuse a hyperplane")
    assert(all.max < Dedup.EmbBands * Dedup.EmbPlanesMax)
  }

  test("bucket prefix-stability: P-plane bucket is the P'-plane bucket truncated") {
    val e = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(64)(j => (((i * 29 + j * 13) % 17) - 8).toFloat))
    }.toDF("vec_id", "embedding")
    def buckets(planes: Int): Map[(Long, Int), String] =
      Dedup.embBandKeys(e, planes).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val b4 = buckets(4)
    val b9 = buckets(9)
    val b16 = buckets(Dedup.EmbPlanesMax)
    assert(b4.keySet == b9.keySet && b9.keySet == b16.keySet)
    b16.foreach { case (k, full) =>
      assert(full.length == Dedup.EmbPlanesMax)
      assert(b4(k) == full.substring(0, 4), s"prefix break at $k (P=4)")
      assert(b9(k) == full.substring(0, 9), s"prefix break at $k (P=9)")
    }
  }

  test("adaptive d05 on an above-floor corpus: wider bucket space, pairs still a subset of exact >= tau") {
    // 2600 vectors: above the 2000 floor edge -> P = 5. A planted
    // near-dup cluster guarantees qualifying pairs survive the tighter
    // banding (identical vectors collide in EVERY band at any P).
    val dir = java.nio.file.Files.createTempDirectory("graft-adapt").toString
    val n = 2600
    // i*j term keeps the tail non-periodic in i (a purely i*a+j*b form
    // repeats every modulus rows, collapsing the occupied-group count)
    (0 until n).map { i =>
      val emb =
        if (i < 8) Array.tabulate(64)(j => ((j % 5) + 1).toFloat)
        else Array.tabulate(64)(j => (((i * j + i * 31 + j * 17) % 23) - 11).toFloat)
      (i.toLong, emb)
    }.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(Dedup.adaptiveEmbPlanesOf(e) == 5)
    // the bucket space actually widened past the fixed geometry's 192
    val groups = Dedup.embBandKeys(e)
      .select("band", "bucket").distinct().count()
    assert(groups > Dedup.EmbBands.toLong * 16,
      s"only $groups occupied groups — space did not widen")
    val pairs = Dedup.embeddingCosine(spark, dir)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    // the planted clique is fully recovered (28 pairs among ids 0..7)
    val clique = (for (i <- 0 until 8; j <- i + 1 until 8)
      yield (i.toLong, j.toLong)).toSet
    assert(clique.subsetOf(pairs), "planted near-dup clique missed")
    // soundness: verification is exact, so every emitted pair is >= tau
    Dedup.embeddingCosine(spark, dir).collect().foreach { r =>
      assert(r.getDouble(2) > Dedup.CosineThreshold)
    }
  }

  test("d26 planes sweep: monotone work/recall trade, retention rule respected") {
    val sf = "/root/testdata/sf0.01" // sf0.001 carries no >= tau pairs
    val rows = Dedup.embPlanesSweep(spark, sf).collect()
      .sortBy(_.getAs[Int]("planes"))
    assert(rows.map(_.getAs[Int]("planes")).toSeq == Dedup.EmbPlanesGrids)
    val nExact = rows.head.getAs[Long]("n_exact")
    assert(nExact > 0, "fixture must contain >= tau pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == nExact)
      assert(r.getAs[Long]("n_verified") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_verified") <= nExact)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - r.getAs[Long]("n_verified").toDouble / nExact)
        < 1e-12)
    }
    // more planes -> narrower bands: candidates and recall both
    // non-increasing along the grid
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_candidates") <= a.getAs[Long]("n_candidates"),
        s"candidates grew ${a.getAs[Int]("planes")}->${b.getAs[Int]("planes")}")
      assert(b.getAs[Long]("n_verified") <= a.getAs[Long]("n_verified"))
    }
    // exactly one recommended row; it retains >= 95% of the best recall
    // and no cheaper point does
    val rec = rows.filter(_.getAs[Boolean]("recommended"))
    assert(rec.length == 1)
    val qmax = rows.map(_.getAs[Long]("n_verified")).max.toDouble
    assert(rec.head.getAs[Long]("n_verified") >= Dedup.SweepRetention * qmax)
    rows.filter(r => r.getAs[Long]("n_candidates") <
        rec.head.getAs[Long]("n_candidates"))
      .foreach(r => assert(
        r.getAs[Long]("n_verified") < Dedup.SweepRetention * qmax,
        s"cheaper point ${r.getAs[Int]("planes")} also retains"))
    // the consumption seam agrees with the table
    assert(Dedup.recommendedEmbPlanes(spark, sf) ==
      rec.head.getAs[Int]("planes"))
  }

  test("sampled sweep: pct=100 is the full sweep bit-for-bit; the " +
      "registered shard is deterministic and strictly smaller") {
    val sf = "/root/testdata/sf0.01"
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().sortBy(_.getAs[Int]("planes"))
        .map(r => (r.getAs[Int]("planes"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("n_verified"), r.getAs[Long]("n_exact"),
          r.getAs[Boolean]("recommended"))).toSeq
    assert(rowsOf(Dedup.embPlanesSweepSampled(spark, sf, pct = 100)) ==
      rowsOf(Dedup.embPlanesSweep(spark, sf)),
      "pct=100 must degenerate to the full-corpus sweep")
    // the default shard: a pure function of vec_ids — same rows on
    // every run — and a strict subset of the corpus's work
    val s1 = rowsOf(Dedup.embPlanesSweepSampled(spark, sf))
    val s2 = rowsOf(Dedup.embPlanesSweepSampled(spark, sf))
    assert(s1 == s2, "hash-shard must be deterministic across runs")
    val full = rowsOf(Dedup.embPlanesSweep(spark, sf))
    assert(s1.map(_._2).sum < full.map(_._2).sum,
      "sampled candidates must be strictly fewer than full-corpus")
    intercept[IllegalArgumentException] {
      Dedup.embPlanesSweepSampled(spark, sf, pct = 0)
    }
  }

  test("plane ladder past the ceiling: pins to EmbPlanesMax at every " +
      "rung edge, Column form agrees with the driver form") {
    val t = Dedup.EmbTargetOccupancy
    // the exact cap edge: N = T·2^16 is the LAST corpus the ceiling
    // holds target occupancy for; every larger N pins to the ceiling
    assert(Dedup.adaptiveEmbPlanes(t << Dedup.EmbPlanesMax) ==
      Dedup.EmbPlanesMax)
    assert(Dedup.adaptiveEmbPlanes((t << (Dedup.EmbPlanesMax - 1)) + 1) ==
      Dedup.EmbPlanesMax)
    assert(Dedup.adaptiveEmbPlanes(t << (Dedup.EmbPlanesMax - 1)) ==
      Dedup.EmbPlanesMax - 1)
    // 10^10 vectors — the 100 TB order of magnitude: the ladder pins,
    // it does not overflow or throw (scoping is the recipe, see
    // EmbPlanesMax's scaladoc and embeddingCosineScoped/d27)
    assert(Dedup.adaptiveEmbPlanes(10000000000L) == Dedup.EmbPlanesMax)
    // the distributed (Column) ladder d27 derives per-scope rungs with
    // agrees with the driver-side ladder everywhere, including past cap
    val ns = Seq(1L, 125L, 2000L, 2001L, 5000L, 999999L,
      t << 15, (t << 15) + 1, t << 16, Long.MaxValue)
    val got = ns.toDF("n")
      .select(col("n"), Dedup.embPlanesLadder(col("n")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ns.foreach(n => assert(got(n) == Dedup.adaptiveEmbPlanes(n),
      s"ladder forms disagree at n=$n"))
  }

  test("d27 scoped banding is bit-identical to running d05 per scope, " +
      "with each scope on its OWN ladder rung") {
    // three scopes of very different populations: scope 0 lands above
    // the floor edge (2600 → P=5), scopes 1 and 2 stay at the floor
    // (300 → P=4) — the whole point of d27 is that one frame carries
    // several rungs at once. Each scope gets a planted near-dup clique
    // (identical vectors collide in every band at any P), plus a pair
    // of identical vectors SPLIT ACROSS scopes 1|2 that the contract
    // must NOT emit (cross-scope pairs are out of contract).
    val dir = java.nio.file.Files.createTempDirectory("graft-d27").toString
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Float], Int)]
    var id = 0L
    def tail(i: Long) = Array.tabulate(64)(j =>
      (((i * j + i * 31 + j * 17) % 23) - 11).toFloat)
    // mutually near-orthogonal clique patterns (pairwise |cos| < 0.03):
    // same magnitudes, sign stripes of different widths per scope —
    // so the cross-scope plant cannot accidentally pair with the HOST
    // scope's own clique
    def clique(scope: Int): Array[Float] = Array.tabulate(64) { j =>
      val sign = scope match {
        case 0 => 1
        case 1 => if (j % 2 == 0) 1 else -1
        case _ => if ((j / 2) % 2 == 0) 1 else -1
      }
      (sign * ((j % 5) + 1)).toFloat
    }
    (0 until 2600).foreach { i =>
      rows += ((id, if (i < 6) clique(0) else tail(id), 0)); id += 1
    }
    (0 until 300).foreach { i =>
      rows += ((id, if (i < 4) clique(1) else tail(id), 1)); id += 1
    }
    (0 until 300).foreach { i =>
      rows += ((id, if (i < 4) clique(2) else tail(id), 2)); id += 1
    }
    // the cross-scope plant: one more copy of scope 1's clique vector,
    // living in scope 2 — within-scope it pairs with nothing
    val crossId = id
    rows += ((crossId, clique(1), 2)); id += 1
    rows.toSeq.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Dedup.embeddingCosineScoped(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: physically shard the corpus by label and run the plain
    // adaptive d05 on each shard — per-scope counts drive the same
    // ladder, and prefix-stability makes direct banding at a scope's
    // rung identical to truncating the wide string
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val want = Seq(0, 1, 2).flatMap { l =>
      val sd = java.nio.file.Files
        .createTempDirectory(s"graft-scope-$l").toString
      e.filter(col("label") === l).drop("label")
        .write.parquet(s"$sd/embeddings.parquet")
      Dedup.embeddingCosine(spark, sd).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(got.nonEmpty && got == want,
      s"scoped mismatch: got-only ${got.diff(want).take(3)}, " +
        s"want-only ${want.diff(got).take(3)}")
    // every planted clique recovered within its scope…
    assert(got.count { case (a, b, _) => a < 6 && b < 6 } == 15,
      "scope-0 clique (6 ids → 15 pairs) missed")
    // …and the cross-scope twin emitted with NOBODY (its cosine-1.0
    // partners live in scope 1; it is alone in scope 2's geometry)
    assert(!got.exists { case (a, b, _) => a == crossId || b == crossId },
      "cross-scope pair leaked into the within-scope contract")
  }

  test("d27b planted fixture: one same-scope twin per scope emitted, " +
      "cross-scope plant excluded, base pairs preserved") {
    val sf = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    val scopes = e.select(col("label")).distinct().count()
    val mins = e.groupBy("label").agg(min(col("vec_id")).as("v"))
      .collect().map(_.getAs[Long]("v")).toSet
    val got = Dedup.embeddingCosineScopedPlanted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every scope's planted twin recovered at cosine 1.0…
    val planted = got.filter { case (a, b, _) => b == a + off }
    assert(planted.length == scopes,
      s"expected $scopes planted twins, got ${planted.length}")
    assert(planted.forall { case (a, _, c) => mins(a) && c > 0.999999 },
      "planted twin must pair each scope's min vec_id at cosine ~1")
    // …the cross-scope plant (ids ≥ 2·off) pairs with NOBODY…
    assert(!got.exists { case (a, b, _) => a >= 2 * off || b >= 2 * off },
      "cross-scope plant leaked into the within-scope contract")
    // …and the base corpus's own within-scope pairs (if any) survive:
    // d27 output is a subset of d27b's sub-off rows
    val base = Dedup.embeddingCosineScoped(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base.subsetOf(
      got.filter { case (a, b, _) => a < off && b < off }.toSet))
  }

  test("d27 scoped banding on an EMPTY corpus returns the empty frame " +
      "(ladder floor, no NPE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    assert(Dedup.embeddingCosineScoped(spark, dir).collect().isEmpty)
  }

  test("d19b sampled agreement IS d19 on the physical md5 shard " +
      "(bit-identical), and the shard pair path carries real pairs") {
    // corpus with ids whose md5 bucket is < 50 (in-shard) hosting a
    // planted twin, plus an out-of-shard twin that must NOT count
    def bucket(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 100).toInt
    }
    val pct = Dedup.AgreementSamplePct
    val in = (0L until 400L).filter(bucket(_) < pct).take(60)
    val out = (0L until 400L).filter(bucket(_) >= pct).take(60)
    require(in.size == 60 && out.size == 60)
    def vec(seed: Long): Array[Float] = Array.tabulate(64)(j =>
      (((seed * j + seed * 31 + j * 17) % 23) - 11).toFloat)
    val twin = Array.tabulate(64)(j => ((j % 5) + 1).toFloat)
    // twins at the first two IN-shard ids; another twin pair at the
    // first two OUT-of-shard ids (must not reach the sampled audit)
    val rows =
      in.zipWithIndex.map { case (id, i) =>
        (id, if (i < 2) twin else vec(id), 0) } ++
      out.zipWithIndex.map { case (id, i) =>
        (id, if (i < 2) twin.map(-_) else vec(id + 7919), 0) }
    val dir = java.nio.file.Files.createTempDirectory("graft-d19b").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val sampled = Dedup.dedupMethodAgreementSampled(spark, dir).head()
    // the physical shard: only the in-sample rows, same geometry
    // re-derivation from the shard's own count
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft-d19b-shard").toString
    rows.filter { case (id, _, _) => bucket(id) < pct }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$shardDir/embeddings.parquet")
    val physical = Dedup.dedupMethodAgreement(spark, shardDir).head()
    assert(sampled == physical,
      "sampled operator must equal d19 over the physical shard")
    // the in-shard twin is found by LSH (identical vectors collide in
    // every band), so the sampled pair path is exercised with rows > 0
    assert(sampled.getAs[Long]("n_lsh") >= 1L,
      "in-shard planted twin missed by the sampled agreement audit")
    intercept[IllegalArgumentException] {
      Dedup.dedupMethodAgreementSampled(spark, dir, pct = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.dedupMethodAgreementSampled(spark, dir, pct = 101)
    }
  }

  test("d28 loss audit prices the scope boundary: within-scope twins " +
      "count in n_both, the cross-scope twin lands in n_global_only") {
    // scope 0 hosts a 3-clique (3 within-scope pairs); one more copy of
    // the clique vector lives in scope 1 — globally it pairs with all
    // three clique members (3 more pairs), scoped it pairs with nobody.
    // Identical vectors collide in every band at any rung, so both
    // passes find their respective sets deterministically.
    val clique = Array.tabulate(64)(j => ((j % 5) + 1).toFloat)
    def tail(i: Long) = Array.tabulate(64)(j =>
      (((i * j + i * 31 + j * 17) % 23) - 11).toFloat)
    val rows =
      (0L until 600L).map(i => (i, if (i < 3) clique else tail(i), 0)) ++
      (600L until 900L).map(i => (i, tail(i + 7919), 1)) :+
      ((900L, clique.clone(), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft-d28").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = Dedup.scopedLossAudit(spark, dir).head()
    assert(r.getAs[Long]("n_vectors") == 901L)
    assert(r.getAs[Long]("n_both") >= 3L,
      "within-scope clique pairs must be found by BOTH passes")
    assert(r.getAs[Long]("n_global_only") >= 3L,
      "cross-scope twin pairs must be global-only (the priced trade)")
    val cov = r.getAs[Double]("scoped_coverage")
    assert(cov > 0 && cov < 1,
      s"coverage must price a real partial loss, got $cov")
  }

  test("semCore argmax audit: silent-identical on a well-conditioned " +
      "corpus, raises loudly on a quantization-boundary corpus") {
    val sf = "/root/testdata/sf0.001"
    // full-audit run must be value-identical to audit-off (the audit
    // only cross-checks; values are untouched when it passes)
    val offR = Dedup.semanticDedupAudited(spark, sf, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val onR = Dedup.semanticDedupAudited(spark, sf, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(offR == onR, "audit changed values — it must only verify")
    // adversarial corpus: N=4 → stride 2 → centroids {0, 2}. Vector 1's
    // float cosine ranks centroid 2 ahead of centroid 0 by ~7.6e-6
    // (outside the 1e-6 margin) because 62 elements of centroid 0 sit
    // just BELOW the decimal quantization boundary (−4.9e-7 → 0) and
    // one just ABOVE it (5.2e-7 → 1e-6): the exact-decimal argmax is
    // centroid 0, strictly. The margin path assigns 2 — the audit must
    // refuse to let that stand.
    val c1 = Array.tabulate(64)(j =>
      if (j == 0) 0.5f else if (j == 63) 5.2e-7f else -4.9e-7f)
    val c2 = Array.tabulate(64)(j => if (j == 0) 0.5f else 0f)
    val v = Array.fill(64)(0.5f)
    val dir = java.nio.file.Files.createTempDirectory("graft-adv").toString
    Seq((0L, c1, 0), (1L, v, 0), (2L, c2, 0), (3L, c2.clone(), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    // audit off: the wrong assignment passes silently (vec 1 → cid 2)
    val silent = Dedup.semanticDedupAudited(spark, dir, 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(silent(1L) == 2L,
      "adversarial corpus no longer diverges — rebuild the fixture")
    // audit on: the divergence fails loudly instead
    val ex = intercept[Throwable] {
      Dedup.semanticDedupAudited(spark, dir, 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("semCore argmax audit")),
      s"expected the audit raise, got: ${messages(ex).mkString(" | ")}")
  }

  test("CorpusCount: memoizes identical plans, distinguishes filters, skips non-file frames") {
    CorpusCount.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    spark.range(100).selectExpr("id AS vec_id")
      .write.parquet(s"$dir/t.parquet")
    def frame() = spark.read.parquet(s"$dir/t.parquet")
    assert(CorpusCount.memo(frame()) == 100L)
    val after1 = CorpusCount.size
    // an independently-built identical plan hits the same entry
    assert(CorpusCount.memo(frame()) == 100L)
    assert(CorpusCount.size == after1, "identical plan missed the cache")
    // a different population filter over the SAME files is a new entry
    assert(CorpusCount.memo(frame().filter(col("vec_id") >= 40L)) == 60L)
    assert(CorpusCount.size == after1 + 1)
    // in-memory frames bypass the cache entirely
    val mem = Seq(1L, 2L, 3L).toDF("vec_id")
    val before = CorpusCount.size
    assert(CorpusCount.memo(mem) == 3L)
    assert(CorpusCount.size == before, "non-file frame must not be cached")
    CorpusCount.clear()
  }
}
