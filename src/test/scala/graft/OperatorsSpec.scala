package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, TextPrep}

/** North-star operator internals not covered by the DuckDB oracle. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("multimodal: real BMP/WAV header decode round-trips through mapPartitions") {
    val assets = Multimodal.assets(spark, sf)
    val dec = Multimodal.decodeAll(assets).cache()
    assert(dec.count() == assets.count())
    val texts = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // even doc -> BMP: parsed header fields match the synthesizer geometry
    // and the decoded pixel array is exactly the embedded text prefix
    val bmp = dec.filter(_.doc_id == 0).head()
    val t0 = texts(0L); val len0 = t0.length
    val w = Multimodal.MediaCodec.bmpWidth(len0)
    val npx = 3 * w * (len0 / (3 * w))
    assert(bmp.fmt == "bmp" && bmp.width == w && bmp.height == len0 / (3 * w))
    assert(bmp.byte_len == 54 + npx && bmp.n_frames == 1)
    assert(bmp.data.toSeq == t0.take(npx).map(_.toInt))
    // odd doc -> WAV: rate/channels/frame count parsed from the header
    val wav = dec.filter(_.doc_id == 1).head()
    val t1 = texts(1L); val dl = t1.length - t1.length % 2
    assert(wav.fmt == "wav" && wav.sample_rate == 8000 && wav.channels == 1)
    assert(wav.n_frames == dl / 2 && wav.byte_len == 44 + dl)
    assert(wav.data.toSeq == t1.take(dl).map(_.toInt))
  }

  test("multimodal: golden BMP decodes; malformed containers are rejected") {
    import Multimodal.{MediaAsset, MediaCodec}
    val px = Array.tabulate(12)(i => (i + 1).toByte) // 4x1, 24 bpp
    val bytes = MediaCodec.encodeBmp(px, 4, 1)
    assert(bytes.length == 54 + 12 && bytes(0) == 'B' && bytes(1) == 'M')
    val d = MediaCodec.decode(MediaAsset(9L, bytes, "image/bmp"))
    assert(d.width == 4 && d.height == 1 && d.data.toSeq == (1 to 12))
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaAsset(9L, bad, "image/bmp"))
    }
    val truncated = bytes.take(40)
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaAsset(9L, truncated, "image/bmp"))
    }
    // every malformed shape surfaces as IllegalArgumentException — the
    // DLQ-routing contract — never as an index/arithmetic error
    intercept[IllegalArgumentException] { // 3-byte junk: too short for magic
      MediaCodec.decode(MediaAsset(9L, Array[Byte]('R', 'I', 'F'), "x"))
    }
    val negH = bytes.clone() // negative height (top-down BMP marker): reject
    java.nio.ByteBuffer.wrap(negH).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -1)
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaAsset(9L, negH, "image/bmp"))
    }
    val wav0 = MediaCodec.encodeWav(Array.tabulate(8)(_.toByte))
    val zeroCh = wav0.clone() // channels=0 would divide by zero in n_frames
    java.nio.ByteBuffer.wrap(zeroCh).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(22, 0)
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaAsset(9L, zeroCh, "audio/wav"))
    }
    val negSz = wav0.clone() // negative data-size: NegativeArraySize hazard
    java.nio.ByteBuffer.wrap(negSz).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, -1)
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaAsset(9L, negSz, "audio/wav"))
    }
    val negOff = bytes.clone() // negative pixel offset: OOB-read hazard
    java.nio.ByteBuffer.wrap(negOff).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, -64)
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaAsset(9L, negOff, "image/bmp"))
    }
    val hugeW = bytes.clone() // width*3 overflows Int to a negative stride
    java.nio.ByteBuffer.wrap(hugeW).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 0x40000000)
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaAsset(9L, hugeW, "image/bmp"))
    }
  }

  test("multimodal: resize yields a constant-size vector via nearest-neighbor") {
    val dec = Multimodal.decodeAll(Multimodal.assets(spark, sf)).cache()
    val resized = Multimodal.resize(dec, target = 32).cache()
    assert(resized.count() == dec.count())
    val r = resized.filter(col("doc_id") === 0).head()
    val pixels = r.getSeq[Int](2)
    assert(pixels.length == 32)
    val data = dec.filter(_.doc_id == 0).head().data
    // nearest-neighbor over the DECODED stream: out[i] = data[floor(i*len/32)]
    assert(pixels(0) == data(0))
    assert(pixels(31) == data((31L * data.length / 32).toInt))
  }

  test("multimodal: frame sampling yields every k-th decoded byte") {
    val one = Multimodal.decodeAll(Multimodal.assets(spark, sf))
      .filter(_.doc_id == 0)
    val data = one.head().data
    val frames = Multimodal.sampleFrames(one, everyK = 10)
      .orderBy("frame_offset").collect()
    assert(frames.length == (data.length + 9) / 10)
    assert(frames.head.getInt(2) == data(0))
  }

  test("q27b approx percentiles track exact percentiles within sketch error") {
    import graft.operators.ExtendedQueries
    // the gate query computes per-percentile tolerance assertions from the
    // live sketch against Spark's exact percentile in one aggregation;
    // rank error 1/10000 on ~2k rows/group keeps approx within a handful
    // of ranks of exact — 2% relative tolerance is generous headroom
    val exact = ExtendedQueries.q27Percentiles(spark, sf)
      .collect().map(r => r.getString(0)).toSet
    val approx = ExtendedQueries.q27bPercentilesApprox(spark, sf).collect()
    assert(approx.map(_.getString(0)).toSet == exact)
    approx.foreach { r =>
      assert(r.getAs[Boolean]("p50_within_2pct"), s"${r.getString(0)} p50")
      assert(r.getAs[Boolean]("p95_within_2pct"), s"${r.getString(0)} p95")
      assert(r.getAs[Boolean]("p99_within_2pct"), s"${r.getString(0)} p99")
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("t13 source profile conserves docs and counts dup exposure exactly") {
    import graft.operators.{Dedup, TextAnalysis}
    val rows = TextAnalysis.sourceProfile(spark, sf).collect()
    val docs = Tables.table(spark, sf, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    // near-dup exposure across sources == distinct docs in any d02 pair
    val pairs = Dedup.minhashLsh(spark, sf).select("da", "db")
      .as[(Long, Long)].collect()
    val dupDocs = pairs.flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(rows.map(_.getAs[Long]("n_near_dup")).sum == dupDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_high_quality") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_lang_mismatch") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_tokens") > 0)
    }
  }

  test("p09 curriculum stages partition the corpus with ordered score ranges") {
    import graft.operators.Sampling
    val rows = Sampling.curriculum(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet.subsetOf(Set("s1_low", "s2_mid", "s3_high")))
    val nDocs = Tables.table(spark, sf, "documents").count()
    assert(rows.values.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // stages are score-disjoint and ordered: every doc in exactly one
    rows.get("s1_low").foreach(r => assert(r.getAs[Double]("max_score") < 0.41))
    rows.get("s2_mid").foreach { r =>
      assert(r.getAs[Double]("min_score") >= 0.41 &&
        r.getAs[Double]("max_score") < 0.43)
    }
    rows.get("s3_high").foreach(r => assert(r.getAs[Double]("min_score") >= 0.43))
    rows.values.foreach(r => assert(r.getAs[Long]("n_tokens") > 0))
  }

  test("s10 index stats: occupancy partitions the corpus for both indexes") {
    import graft.operators.Similarity
    val n = Tables.table(spark, sf, "embeddings").count()
    val rows = Similarity.indexStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("lsh", "ivf"))
    rows.values.foreach { r =>
      // every vector lands in exactly one bucket/list — occupancy conserves
      assert(r.getAs[Long]("n_vectors") == n)
      assert(r.getAs[Long]("min_size") >= 1)
      assert(r.getAs[Long]("max_size") <= n)
      val share = r.getAs[Double]("max_share")
      assert(share > 0 && share <= 1.0)
    }
    assert(rows("lsh").getAs[Long]("n_groups") <= (1L << Similarity.NumPlanes))
  }

  test("d08 containment flags doc-in-doc that symmetric jaccard misses") {
    import graft.operators.Dedup
    // inner quoted verbatim inside a 4x-bigger container: jaccard is
    // diluted far below 0.8, but containment(inner -> outer) is ~1.0
    val inner = (1 to 30).map(i => s"tok$i").mkString(" ")
    val filler = (100 to 190).map(i => s"pad$i").mkString(" ")
    val corpus = Seq(
      (0L, inner),
      (1L, s"$filler $inner"),
      (2L, (200 to 260).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.containmentOf(spark, corpus).collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"doc-in-doc pair missing from $pairs")
    val row = got.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    assert(row.getAs[Double]("containment") == 1.0)
    // the symmetric d04 view of the same corpus misses it (union-diluted)
    val jac = Dedup.ngramJaccardOf(spark, corpus).collect()
    assert(!jac.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    // and no false positives against the unrelated doc
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("t12 surprisal matches a direct corpus-frequency recompute") {
    import graft.operators.TextAnalysis
    val texts = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def toksOf(t: String) = t.trim.toLowerCase.split("\\s+").toSeq
    val freq = texts.values.flatMap(toksOf).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    def rarity(f: Int) =
      if (f >= 1024) 0 else if (f >= 256) 1 else if (f >= 64) 2
      else if (f >= 16) 3 else if (f >= 4) 4 else 5
    val got = TextAnalysis.surprisal(spark, sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val rs = toksOf(texts(r.getLong(0))).map(t => rarity(freq(t)))
      assert(r.getAs[Long]("n_tokens") == rs.length)
      assert(r.getAs[Long]("rarity_sum") == rs.sum.toLong)
      assert(r.getAs[Long]("n_rare") == rs.count(_ == 5).toLong)
      assert(math.abs(r.getAs[Double]("mean_rarity") -
        rs.sum.toDouble / rs.length) < 1e-12)
    }
  }

  test("m07 audio stats match a direct int16 decode of every WAV") {
    val texts = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = Multimodal.audioStatsQuery(spark, sf).collect()
    assert(got.nonEmpty && got.forall(_.getLong(0) % 2 == 1))
    got.foreach { r =>
      val t = texts(r.getLong(0))
      val samples = t.take(t.length - t.length % 2).grouped(2).map { p =>
        val raw = p(0).toInt + 256 * p(1).toInt
        if (raw > 32767) raw - 65536 else raw
      }.toSeq
      assert(r.getAs[Int]("n_samples") == samples.length)
      assert(r.getAs[Int]("peak_abs") == samples.map(math.abs).max)
      assert(r.getAs[Long]("sum_sq") ==
        samples.map(v => v.toLong * v).sum)
      assert(r.getAs[Long]("n_clipped") ==
        samples.count(v => v == 32767 || v == -32768))
    }
  }

  test("m08 image quadrant sums partition the total pixel sum") {
    val texts = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = Multimodal.imagePatchQuery(spark, sf).collect()
    assert(got.nonEmpty && got.forall(_.getLong(0) % 2 == 0))
    got.foreach { r =>
      val t = texts(r.getLong(0))
      val w = Multimodal.MediaCodec.bmpWidth(t.length)
      val declen = 3 * w * (t.length / (3 * w))
      assert(r.getAs[Int]("width") == w)
      val sums = r.getAs[String]("quadrant_sums_json")
        .stripPrefix("[").stripSuffix("]").split(",").map(_.toLong)
      assert(sums.length == 4)
      // the quadrants tile the pixel array exactly: sums partition the total
      assert(sums.sum == t.take(declen).map(_.toLong).sum)
    }
  }

  test("m06 still segments match a direct scan of every payload") {
    val texts = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def runsOf(t: String): Seq[(Int, Int, Int)] = { // (start, len, byte)
      val rs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var i = 0
      while (i < t.length) {
        var j = i
        while (j < t.length && t(j) == t(i)) j += 1
        rs += ((i, j - i, t(i).toInt)); i = j
      }
      rs.toSeq
    }
    val got = Multimodal.stillSegmentsQuery(spark, sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val id = r.getLong(0); val t = texts(id)
      // runs are over the DECODED stream = the container-truncated prefix
      val declen =
        if (id % 2 == 0) {
          val w = Multimodal.MediaCodec.bmpWidth(t.length)
          3 * w * (t.length / (3 * w))
        } else t.length - t.length % 2
      val rs = runsOf(t.substring(0, declen))
      assert(r.getAs[Long]("n_runs") == rs.length)
      val best = rs.minBy { case (start, len, b) => (-len, b, start) }
      assert(r.getAs[Long]("max_run_len") == best._2)
      assert(r.getAs[Int]("max_run_byte") == best._3)
      assert(r.getAs[Int]("max_run_start") == best._1)
    }
  }

  test("q27 endpoint-bucket percentiles match in-memory type-7 on adversarial data") {
    import graft.operators.ExtendedQueries
    def t7(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted
      val pos = q * (s.length - 1)
      val (l, h) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      if (l == h) s(l) else s(l) * (h - pos) + s(h) * (pos - l)
    }
    val rnd = new scala.util.Random(424242)
    val modes: Seq[(String, () => Double)] = Seq(
      "uniform" -> (() => rnd.nextDouble() * 100000),       // many buckets
      "onebucket" -> (() => 500.0 + rnd.nextDouble()),      // all in bucket 0
      "boundary" -> (() => 1000.0 * rnd.nextInt(5)),        // ties on edges
      "negative" -> (() => rnd.nextGaussian() * 2000))      // negative buckets
    for ((mode, gen) <- modes) {
      val sizes = Seq(1, 2, 3, 57, 300) // incl. n=1 (every pos collapses to 0)
      val data = sizes.zipWithIndex.flatMap { case (n, gi) =>
        Seq.fill(n)((s"g$gi", gen())) }
      val got = ExtendedQueries.percentilesOf(data.toDF("l_returnflag", "v"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
      sizes.indices.foreach { gi =>
        val vs = data.filter(_._1 == s"g$gi").map(_._2)
        val (p50, p95, p99, n) = got(s"g$gi")
        assert(n == vs.length, s"$mode g$gi count")
        for ((q, p) <- Seq(0.5 -> p50, 0.95 -> p95, 0.99 -> p99))
          assert(math.abs(p - t7(vs, q)) <= 1e-9 * math.max(1, math.abs(p)),
            s"$mode g$gi q=$q: got $p want ${t7(vs, q)}")
      }
    }
  }

  test("q12b approx distinct tracks exact distinct within 5% at two scales") {
    import graft.operators.CoreQueries
    // the gate query computes the tolerance assertion from the live HLL++
    // sketch; here we assert it holds at both scales and that the exact
    // component agrees with q12's independent exact count
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val exact = CoreQueries.q12CountDistinct(spark, dir)
        .head().getLong(0)
      val r = CoreQueries.q12bApproxDistinct(spark, dir).head()
      assert(r.getAs[Long]("n_cust_exact") == exact, s"$dir exact mismatch")
      assert(r.getAs[Boolean]("approx_within_5pct"),
        s"$dir: sketch drifted beyond 5% of exact $exact")
    }
  }

  test("d06 propagation converges on a chain, reports rounds, and the cap throws") {
    import graft.operators.Dedup
    // chain 0–1–…–11: diameter 11, one hop per round — the adversarial
    // shape for min-label propagation (a silent cap would truncate it)
    val n = 12
    val nodes = (0L until n.toLong).toDF("doc_id")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("da", "db")
    val (labels, rounds) = Dedup.propagateMinLabels(nodes, pairs)
    assert(labels.as[(Long, Long)].collect().forall(_._2 == 0L),
      "every chain member must reach label 0")
    // n-1 propagation rounds + the final no-change round that proves it
    assert(rounds == n, s"expected $n rounds on a diameter-${n - 1} chain, got $rounds")
    // an insufficient cap must fail loudly, never return half-propagated labels
    intercept[IllegalStateException] {
      Dedup.propagateMinLabels(nodes, pairs, maxRounds = 3)
    }
  }

  test("s05: int8 quantization preserves cosine to ~1e-2 on overlapping pairs") {
    import graft.operators.Similarity
    val ex = Similarity.bruteForceTopK(spark, sf)
      .select("qid", "neighbor_id", "cos_sim")
    val qz = Similarity.quantizedTopK(spark, sf)
      .select("qid", "neighbor_id", "qcos")
    val joined = qz.join(ex, Seq("qid", "neighbor_id")).collect()
    // quantized and exact top lists should overlap heavily...
    assert(joined.length >= 10, s"only ${joined.length} overlapping top pairs")
    // ...and agree on the score: int8 rounding perturbs a 64-dim unit dot
    // by O(1/127) per component, well under 0.05 in cosine
    joined.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.05,
        s"qcos ${r.getDouble(2)} vs cos ${r.getDouble(3)}")
    }
  }

  test("trained IVF: k-means centroids beat the probe fraction on clustered data") {
    import graft.operators.Similarity
    // 12 planted clusters in 16 dims; queries 0..9 are members of clusters
    // 0..9. Trained centroids should recover the planted structure, so a
    // SINGLE probed list (probe fraction 1/12 ≈ 8%) should still find
    // nearly all true top-3 neighbors — the gain sampling can't promise.
    val rnd = new scala.util.Random(1234)
    val k = 12; val perCluster = 50; val dim = 16
    val centers = Array.fill(k)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    def jitter(c: Array[Float]) = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val rows =
      (0 until 10).map(c => (c.toLong, jitter(centers(c)))) ++
      (for (c <- 0 until k; i <- 0 until perCluster)
        yield ((10 + c * perCluster + i).toLong, jitter(centers(c))))
    val e = Similarity.withNorm(rows.toDF("vec_id", "embedding")).cache()
    val trained = Similarity.trainCentroids(e.filter(col("vec_id") >= 10), k)
    val got = Similarity.ivfSearch(e, trained, numQueries = 10, nProbe = 1, topK = 3)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    // exact baseline: a single all-enclosing list turns the same flow into
    // brute force (every vector in one inverted list, one probe)
    val allInOne = Similarity
      .withNorm(Seq((0L, Array.fill(dim)(0.01f))).toDF("vec_id", "embedding"))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("nrm").as("cn"))
    val exact = Similarity.ivfSearch(e, allInOne, numQueries = 10, nProbe = 1, topK = 3)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"trained-IVF recall $recall on clustered corpus")
    assert(recall > 1.0 / k + 0.3, "must beat the probe fraction by a wide margin")
  }

  test("IVF ANN recall meets the probe fraction; every hit is a true neighbor") {
    import graft.operators.Similarity
    // On this corpus the embedding space is near-uniform random (plus a few
    // engineered near-dups), so nearest-centroid lists partition it roughly
    // evenly and expected recall ≈ NProbe/K — the honest IVF floor. Real
    // gains come from clustered data; the mechanism under test (assignment,
    // probing, exact re-rank) is identical either way, and the DuckDB
    // oracle already pins its outputs bit-for-bit.
    val exact = Similarity.bruteForceTopK(spark, sf)
      .filter(col("rank") <= 3)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(spark, sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val stride = Similarity.adaptiveStride(
      Tables.table(spark, sf, "embeddings")
        .filter(col("vec_id") >= Similarity.NumQueries).count())
    val k = Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id") % stride === 0 &&
        col("vec_id") >= Similarity.NumQueries).count()
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(ivf.nonEmpty)
    assert(recall >= Similarity.NProbe.toDouble / k - 0.05,
      s"IVF recall $recall below probe fraction ${Similarity.NProbe}/$k")
  }

  test("cohort retention: offset-0 cells are full cohorts, later cells never exceed them") {
    import graft.operators.ExtendedQueries
    val rows = ExtendedQueries.q41CohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("week_offset") >= 0)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_cohort"))
      // a user is active in their own first week by definition
      if (r.getAs[Long]("week_offset") == 0) {
        assert(r.getAs[Long]("n_users") == r.getAs[Long]("n_cohort"))
        assert(r.getAs[Double]("retention") == 1.0)
      }
    }
  }

  test("event funnel narrows monotonically with sane conversions") {
    import graft.operators.ExtendedQueries
    val rows = ExtendedQueries.q42EventFunnel(spark, sf).collect()
    assert(rows.map(_.getAs[String]("step")).toSeq ==
      Seq("1_signup", "2_view", "3_click", "4_purchase"))
    val n = rows.map(_.getAs[Long]("n_users"))
    assert(n.zip(n.tail).forall { case (a, b) => b <= a })
    assert(rows.head.getAs[Double]("conv_from_prev") == 1.0)
    rows.tail.foreach { r =>
      val c = r.getAs[Double]("conv_from_prev")
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("funnel steps are a parameter: a 3-step funnel with strict ordering") {
    import graft.operators.ExtendedQueries
    import spark.implicits._
    // u1 completes view→click→purchase in order; u2 clicks BEFORE its
    // view (strictly-after must reject it past step 1); u3 ties click to
    // view's timestamp (ties are not "after"); u4 never views
    val ev = Seq(
      ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
      ("u2", "click", 5L), ("u2", "view", 10L), ("u2", "purchase", 50L),
      ("u3", "view", 10L), ("u3", "click", 10L),
      ("u4", "click", 1L), ("u4", "purchase", 2L)
    ).toDF("user_id", "event_type", "ts_us")
    val rows = ExtendedQueries
      .funnelOf(ev, Seq("view", "click", "purchase")).collect()
    assert(rows.map(r => r.getAs[String]("step") ->
      r.getAs[Long]("n_users")).toSeq ==
      Seq("1_view" -> 3L, "2_click" -> 1L, "3_purchase" -> 1L))
    // u2's purchase IS after its view, but its click isn't — the funnel
    // is ordered end-to-end, not per-step-pair
    assert(rows.last.getAs[Double]("conv_from_prev") == 1.0)

    // 10+ steps: conversion must pair each step with its true
    // predecessor, not the lexicographic one ("10_x" sorts before "2_x")
    val types = (1 to 11).map(i => s"s$i")
    val long = (1 to 11).flatMap { i =>
      // user u_k completes the first k steps in order → step i has 12-i
      // completers and every conv_from_prev (after step 1) is exact
      (i to 11).map(k => (s"u$k", s"s$i", i.toLong * 10))
    }.toDF("user_id", "event_type", "ts_us")
    val lrows = ExtendedQueries.funnelOf(long, types).collect()
    assert(lrows.map(_.getAs[String]("step")).toSeq ==
      (1 to 11).map(i => s"${i}_s$i"))
    assert(lrows.map(_.getAs[Long]("n_users")).toSeq ==
      (1 to 11).map(i => (12 - i).toLong))
    lrows.zipWithIndex.tail.foreach { case (r, i) =>
      assert(r.getAs[Double]("conv_from_prev") ==
        (11.0 - i) / (12.0 - i), s"step ${i + 1} conversion wrong")
    }

    // on the live corpus, the default funnel via the parameterized path
    // is byte-identical to the published q42
    val viaParams = ExtendedQueries
      .q42EventFunnel(spark, sf, ExtendedQueries.FunnelSteps)
      .collect().map(_.toString).toSeq
    val viaDefault = ExtendedQueries.q42EventFunnel(spark, sf)
      .collect().map(_.toString).toSeq
    assert(viaParams == viaDefault)
  }

  test("series top-k: neighbors share the peak hour, ranks and cosines sane") {
    import graft.operators.ExtendedQueries
    val rows = ExtendedQueries.q44SeriesTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("qid") != r.getAs[Long]("neighbor_id"))
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.size))
      assert(rs.size <= 3)
    }
    // band invariant: every (qid, neighbor) pair peaks in the same hour
    import spark.implicits._
    val peaks = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("user_id"), (expr("ts_us div 3600000000") % 24).as("hour"),
        col("value").cast("decimal(12,6)").as("v"))
      .groupBy("user_id", "hour").agg(sum("v").as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("s").desc, col("hour").asc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("hour")).as[(Long, Long)].collect().toMap
    rows.foreach { r =>
      assert(peaks(r.getAs[Long]("qid")) == peaks(r.getAs[Long]("neighbor_id")),
        s"pair ${r.getAs[Long]("qid")}→${r.getAs[Long]("neighbor_id")} " +
          "crosses peak-hour bands")
    }
  }

  test("q44 band grid: pair-exact vs the plain self-join, bounded cells, " +
      "no exchange keyed on bare peak_hour") {
    import graft.operators.ExtendedQueries
    import graft.ops.SaltedJoin
    import spark.implicits._
    // a skewed 24-band peak table: 70% of users in one hot hour — the
    // shape the raw peak_hour self-join serializes at scale
    val salts = 4
    val peak = spark.range(200).select($"id".as("user_id"),
      when($"id" < 140, lit(9L)).otherwise($"id" % 23).as("peak_hour"))
    val plain = peak.as("a").join(peak.as("b"),
        $"a.peak_hour" === $"b.peak_hour" && $"a.user_id" =!= $"b.user_id")
      .select($"a.user_id".as("a"), $"b.user_id".as("b"))
      .as[(Long, Long)].collect().toSet
    val grid = SaltedJoin
      .selfPairsGridDirected(peak, Seq("peak_hour"), "user_id", salts)
    // bit-identical directed pair set, each pair emitted exactly once
    assert(grid.as[(Long, Long)].collect().toSet == plain)
    assert(grid.count() == plain.size)
    // the hot band's rows spread across every grid cell, each well under
    // the undecomposed band size (140 rows in ONE join partition before)
    val cell = pmod(xxhash64($"user_id"), lit(salts.toLong)).cast("int")
    val cells = peak.filter($"peak_hour" === 9L).withColumn("c", cell)
      .groupBy("c").count().as[(Int, Long)].collect().toMap
    assert(cells.size == salts, "hot band must occupy every grid cell")
    assert(cells.values.max < 140 / 2,
      s"cell of ${cells.values.max} rows is not a spread")
    // plan shape on the LIVE query: every hash partitioning that involves
    // peak_hour also carries the grid cells — no exchange keys on the
    // bare 24-value band (VERDICT r08 item 1)
    val planStr = ExtendedQueries.q44SeriesTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(planStr.contains("__gi"), "grid decomposition missing from plan")
    val bare = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(planStr).map(_.group(1))
      .filter(ks => ks.contains("peak_hour") && !ks.contains("__gi"))
      .toSeq
    assert(bare.isEmpty, s"exchange keyed on bare peak_hour: $bare")
  }

  test("small-quantity revenue matches a plain-Scala recompute") {
    import graft.operators.ExtendedQueries
    import spark.implicits._
    val got = ExtendedQueries.q45SmallQtyRevenue(spark, sf)
      .head().getDouble(0)
    // mirror: per-part sums with exact BigDecimal, 5*qty*cnt < sum filter
    val rows = Tables.table(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .as[(Long, Double, Double)].collect()
    val brand = Tables.table(spark, sf, "part")
      .filter(col("p_brand") === "Brand#4")
      .select("p_partkey").as[Long].collect().toSet
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val perPart = rows.groupBy(_._1).map { case (k, rs) =>
      k -> (rs.map(r => d2(r._2)).sum, rs.size) }
    val kept = rows.filter { case (pk, qty, _) =>
      brand.contains(pk) && {
        val (sumQty, cnt) = perPart(pk)
        d2(qty) * cnt * 5 < sumQty
      } }
    val expected = (kept.map(r => d2(r._3)).sum.toDouble / 7.0)
    assert(got == expected, s"got $got expected $expected")
  }

  test("co-purchase pairs match a plain-Scala basket count") {
    import graft.operators.ExtendedQueries
    val got = ExtendedQueries.q43CopurchasePairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("n_orders")))
    val items: Set[(Long, Long)] = Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().toSet
    val baskets = items.groupBy(_._1).values
      .map(_.map(_._2).toSeq.sorted)
      .filter(_.size <= ExtendedQueries.MaxBasketSize)
    val counts = baskets.flatMap(b =>
      for (i <- b.indices; j <- i + 1 until b.size) yield (b(i), b(j)))
      .groupBy(identity).map { case (p, o) => (p._1, p._2, o.size.toLong) }
    val expected = counts.toSeq
      .sortBy { case (a, b, n) => (-n, a, b) }.take(20)
    assert(got.toSeq == expected)
  }

  test("cut accounting conserves token mass against d16's spans") {
    import graft.operators.Dedup
    val acct = Dedup.cutAccounting(spark, sf).collect()
    assert(acct.nonEmpty)
    val totalCut = Dedup.passageCuts(spark, sf).collect()
      .map(_.getAs[Long]("n_tokens_cut")).sum
    assert(acct.map(_.getAs[Long]("tokens_cut")).sum == totalCut)
    acct.foreach { r =>
      assert(r.getAs[Long]("net_tokens") ==
        r.getAs[Long]("tokens_total") - r.getAs[Long]("tokens_cut"))
      val rate = r.getAs[Double]("cut_rate")
      assert(rate >= 0.0 && rate < 1.0)
    }
    val docs = Tables.table(spark, sf, "documents").count()
    assert(acct.map(_.getAs[Long]("n_docs")).sum == docs)
  }

  test("shard manifest partitions p04's layout without losing a document") {
    import graft.operators.Sampling
    val B = Sampling.BinsPerShard
    val manifest = Sampling.shardManifest(spark, sf).collect()
    val packed = Sampling.sequencePacking(spark, sf).collect()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == packed.length)
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum ==
      packed.map(_.getAs[Long]("n_tokens")).sum)
    manifest.foreach { r =>
      val shard = r.getAs[Long]("shard_id")
      // the covered bin range starts inside the shard; straddlers may
      // push last_bin past it, and they are exactly the handoff count
      assert(r.getAs[Long]("first_bin") >= shard * B &&
        r.getAs[Long]("first_bin") < (shard + 1) * B)
      val straddle = packed.count { p =>
        p.getAs[String]("lang") == r.getAs[String]("lang") &&
          p.getAs[Long]("start_bin") / B == shard &&
          p.getAs[Long]("end_bin") / B > shard
      }
      assert(r.getAs[Long]("n_straddle_out") == straddle)
    }
  }

  test("the sweep audits leave no cached plans behind") {
    import graft.operators.{Dedup, Similarity}
    // a leaked persist would silently rewrite every LATER query's plan
    // (the cache manager substitutes cached plans into matching scans)
    spark.catalog.clearCache()
    Dedup.lshTuningAudit(spark, sf).collect()
    Similarity.ivfProbeAudit(spark, sf).collect()
    Similarity.pqTuningSweep(spark, sf).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "an eval sweep left a persisted frame in the cache manager")
  }

  test("PQ sweep: code size scales with M and recall stays sane at every point") {
    import graft.operators.Similarity
    val rows = Similarity.pqTuningSweep(spark, sf).orderBy("pq_m").collect()
    assert(rows.map(_.getAs[Int]("pq_m")).toSeq == Similarity.PqSweepMs)
    rows.foreach { r =>
      assert(r.getAs[Int]("pq_m") * r.getAs[Int]("subdim") == Similarity.Dim)
      assert(r.getAs[Long]("bytes_per_vec") == r.getAs[Int]("pq_m").toLong)
      val rec = r.getAs[Double]("recall_at_3")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(rec == r.getAs[Long]("n_hits").toDouble /
        r.getAs[Long]("n_possible"))
    }
    // the production point (M=8) must appear and match s09's pq recall
    val prod = rows.find(_.getAs[Int]("pq_m") == Similarity.PqM).get
    val s09pq = Similarity.quantizationRecall(spark, sf).collect()
      .find(_.getAs[String]("method") == "pq").get
    assert(prod.getAs[Double]("recall_at_3") ==
      s09pq.getAs[Double]("recall_at_3"))
  }

  test("embedding drift halves partition s11's stats exactly") {
    import graft.operators.Similarity
    val drift = Similarity.embeddingDrift(spark, sf).collect()
      .map(r => r.getAs[Int]("dim") -> r).toMap
    val stats = Similarity.embeddingStats(spark, sf).collect()
    assert(drift.size == stats.length)
    stats.foreach { s11 =>
      val d = drift(s11.getAs[Int]("dim"))
      // the parity halves partition every dimension's vectors
      assert(d.getAs[Long]("n_a") + d.getAs[Long]("n_b") ==
        s11.getAs[Long]("n_vecs"))
      // each half's mean stays inside the full-population range
      for (m <- Seq(d.getAs[Double]("mean_a"), d.getAs[Double]("mean_b"))) {
        assert(m >= s11.getAs[Double]("min_v") && m <= s11.getAs[Double]("max_v"))
      }
      assert(d.getAs[Double]("mean_shift") ==
        math.abs(d.getAs[Double]("mean_a") - d.getAs[Double]("mean_b")))
    }
  }

  test("IVF probe sweep: recall and work grow with the budget, never brute force") {
    import graft.operators.Similarity
    val rows = Similarity.ivfProbeAudit(spark, sf).orderBy("n_probe").collect()
    assert(rows.map(_.getAs[Int]("n_probe")).toSeq == Similarity.ProbeSweep)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits <= r.getAs[Long]("n_possible"))
      assert(r.getAs[Double]("recall_at_3") ==
        hits.toDouble / r.getAs[Long]("n_possible"))
    }
    // a bigger budget probes a superset of lists: candidates and hits are
    // monotone in n_probe
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(cands.zip(cands.tail).forall { case (a, b) => a < b })
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b })
    // even the widest budget re-ranks a strict subset of the corpus —
    // the sweep must never degenerate into brute force
    val n = Tables.table(spark, sf, "embeddings").count()
    assert(cands.last < Similarity.NumQueries * (n - 1))
  }

  test("s12/s14 mark the declared arg-max recommended; s03/s07 accept it") {
    import graft.operators.{Dedup, Similarity}
    import org.apache.spark.sql.Row
    // plain-Scala mirror of the declared rule: cheapest point retaining
    // ≥ SweepRetention of the best quality (then the smallest parameter)
    def checkRec(rows: Seq[Row], qual: Row => Double, cost: Row => Long,
        param: Row => Int): Int = {
      assert(rows.count(_.getAs[Boolean]("recommended")) == 1)
      val qmax = rows.map(qual).max
      val want = rows.sortBy(r =>
        (if (qual(r) >= Dedup.SweepRetention * qmax) 0 else 1,
          cost(r), param(r))).head
      val rec = rows.find(_.getAs[Boolean]("recommended")).get
      assert(param(rec) == param(want),
        s"recommended ${param(rec)} but rule selects ${param(want)}")
      param(rec)
    }
    val np = checkRec(Similarity.ivfProbeAudit(spark, sf).collect().toSeq,
      _.getAs[Double]("recall_at_3"), _.getAs[Long]("n_candidates"),
      _.getAs[Int]("n_probe"))
    assert(Similarity.recommendedNProbe(spark, sf) == np)
    // consumption: search at the recommended budget is a well-formed top-k
    val ivf = Similarity.annIvf(spark, sf, np).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.size))
    }
    val m = checkRec(Similarity.pqTuningSweep(spark, sf).collect().toSeq,
      _.getAs[Double]("recall_at_3"), _.getAs[Long]("bytes_per_vec"),
      _.getAs[Int]("pq_m"))
    assert(Similarity.recommendedPqM(spark, sf) == m)
    val pq = Similarity.pqTopK(spark, sf, m).collect()
    assert(pq.nonEmpty && pq.forall(_.getAs[Int]("rank") <= 3))
    // the parameterized path at the compiled-in defaults IS the default op
    assert(Similarity.annIvf(spark, sf, Similarity.NProbe).collect()
      .map(_.toString).sorted.toSeq ==
      Similarity.annIvf(spark, sf).collect().map(_.toString).sorted.toSeq)
    assert(Similarity.pqTopK(spark, sf, Similarity.PqM).collect()
      .map(_.toString).sorted.toSeq ==
      Similarity.pqTopK(spark, sf).collect().map(_.toString).sorted.toSeq)
  }

  test("IVF-PQ composition: full probe budget degenerates to plain PQ") {
    import graft.operators.Similarity
    // with nProbe >= #centroids every inverted list is probed, so the
    // candidate set is the whole corpus and s15 must equal s07 row-for-row
    // (same codes, same ADC table, same ranking)
    val full = Similarity.ivfPqTopK(spark, sf, nProbe = 10000,
        m = Similarity.PqM)
      .collect().map(_.toString).sorted.toSeq
    val pq = Similarity.pqTopK(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(full == pq)
    // the default budget prunes: a well-formed top-k whose candidates are
    // a subset of the corpus per query
    val pruned = Similarity.ivfPqTopK(spark, sf).collect()
    assert(pruned.nonEmpty)
    pruned.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.size))
      assert(rs.size <= 3)
    }
  }

  test("d04 prefix filter is lossless on adversarial corpora") {
    import graft.operators.Dedup
    // plain-Scala mirror of the operator's semantics: 3-gram distinct
    // shingles, df cap, exact jaccard over full sets
    def shingle(text: String): Set[String] = {
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    def expected(corpus: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
      val sh = corpus.map { case (id, t) => id -> shingle(t) }.toMap
      val cap = math.max(Dedup.DfCapFloor,
        math.floor(Dedup.DfCapFraction * corpus.size).toLong)
      val df = sh.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
      val kept = df.filter(_._2 <= cap).keySet
      (for {
        (a, sa) <- sh; (b, sb) <- sh if a < b
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= Dedup.JaccardThreshold && (sa & sb & kept).nonEmpty
      } yield (a, b, j)).toSet
    }
    def actual(corpus: Seq[(Long, String)]): Set[(Long, Long, Double)] =
      Dedup.ngramJaccardOf(spark, corpus.toDF("doc_id", "text"))
        .as[(Long, Long, Double)].collect().toSet

    // 1. token count 57 ⇒ 55 distinct shingles, 5 | 55: the float form of
    //    the prefix length was one short exactly here (regression)
    val t57 = (1 to 57).map(i => s"w$i").mkString(" ")
    val t57b = (1 to 56).map(i => s"w$i").mkString(" ") + " zz"
    val c1 = Seq(1L -> t57, 2L -> t57, 3L -> t57b, 4L -> "unrelated text entirely here now")
    assert(actual(c1) == expected(c1))
    assert(expected(c1).size >= 2, "fixture must contain qualifying pairs")

    // 2. boilerplate-heavy corpus: a hot template shared by every doc
    //    (df > cap drops its shingles) + one genuine near-dup pair whose
    //    overlap includes non-hot shingles
    val template = "standard legal header text appears in every document"
    val c2 = (1 to 30).map(i => i.toLong -> s"$template unique tail $i alpha beta") ++
      Seq(101L -> s"$template the real payload sentence one two three four five six",
          102L -> s"$template the real payload sentence one two three four five seven")
    assert(actual(c2) == expected(c2))
    assert(expected(c2).exists { case (a, b, _) => a == 101L && b == 102L },
      "the engineered near-dup pair must qualify")
  }

  test("d06: every near-dup pair lands in one cluster; keeper is the min member") {
    import graft.operators.Dedup
    val cl = Dedup.clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val pairs = Dedup.minhashLsh(spark, sf)
      .select("da", "db").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    // connectivity: both endpoints of every verified pair share a cluster
    pairs.foreach { case (a, b) => assert(cl(a)._1 == cl(b)._1) }
    // canonical keeper: exactly the minimum doc_id of each cluster
    cl.groupBy(_._2._1).foreach { case (cluster, members) =>
      assert(cluster == members.keys.min)
      members.foreach { case (doc, (_, keep)) => assert(keep == (doc == cluster)) }
    }
  }

  test("minhash LSH finds every high-jaccard pair the exact scan finds") {
    val exact = Dedup.ngramJaccard(spark, sf)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(spark, sf)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty) // corpus has engineered near-dups
    assert(lsh == exact)   // ≥0.98-jaccard pairs ⇒ band-collision prob ≈ 1
  }

  test("shingles guard short documents") {
    val df = Seq("one two", "a b c d").toDF("text")
      .select(TextPrep.shingles(col("text")).as("sh"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0).isEmpty)
    assert(rows(1) == Seq("a b c", "b c d"))
  }

  test("t11 bigram novelty: bounded, consistent, one row per document") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.bigramNovelty(spark, sf).collect()
    assert(rows.length == Tables.table(spark, sf, "documents").count())
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_common"))
      val nov = r.getAs[Double]("novelty")
      assert(c <= n)
      assert(nov >= 0.0 && nov <= 1.0)
      if (n > 0) assert(math.abs(nov - (1.0 - c.toDouble / n)) < 1e-12)
      else assert(nov == 0.0)
    }
  }

  test("d05b salted path: identical output on a skewed corpus, hot band decomposed") {
    // 50 identical vectors = one hot (band, bucket) group in EVERY band —
    // the s10 max_share alarm condition; 30 varied vectors stay cold
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    (0 until 80).map { i =>
      val emb =
        if (i < 50) Array.tabulate(64)(j => ((j % 7) + 1).toFloat)
        else Array.tabulate(64)(j => (((i * 31 + j * 17) % 13) - 6).toFloat)
      (i.toLong, emb)
    }.toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = rows(Dedup.embeddingCosine(spark, dir))
    val salted = rows(
      Dedup.embeddingCosineSalted(spark, dir, hotThreshold = 20, salts = 4))
    assert(plain.nonEmpty && salted == plain)
    // the hot detection fires: at least one (band, bucket) group over 20
    val bb = Dedup.embBandKeys(
      spark.read.parquet(s"$dir/embeddings.parquet"))
    val plainMax = bb.groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(plainMax >= 50, "skew fixture must produce a hot bucket")
    // and the grid spreads it: largest per-cell slice ≪ the hot group
    val maxCell = bb
      .withColumn("c", pmod(xxhash64(col("vec_id")), lit(4L)).cast("int"))
      .groupBy("band", "bucket", "c").count()
      .agg(max("count")).head().getLong(0)
    assert(maxCell < plainMax / 2,
      s"largest grid cell $maxCell vs hot group $plainMax — not a spread")
  }

  test("q67 hot block: occupancy salting pair-exact on a Zipfian block, " +
      "names ride the grid, bounded cells, TPC-H stays cold") {
    import graft.operators.ExtendedQueries
    // Zipfian name corpus: one dominant block (30% mass — the surname
    // skew real-world ER hits) sharing a 16-char prefix, uniform tail
    val names = spark.range(300).select($"id".as("c_custkey"),
      when($"id" < 90,
          concat(lit("AAAAAAAAAAAAAAAA"), ($"id" % 10).cast("string")))
        .otherwise(format_string("C%015d", $"id")) // unique 16-char prefix
        .as("c_name"))
    val c = names.select($"c_custkey", $"c_name",
      substring($"c_name", 1, ExtendedQueries.Q67BlockPrefix).as("blk"))
    // in-test reference: the plain blocked join + full edit distance
    val plain = c.as("a").join(c.as("b"),
        $"a.blk" === $"b.blk" && $"a.c_custkey" < $"b.c_custkey")
      .withColumn("ed", levenshtein($"a.c_name", $"b.c_name"))
      .filter($"ed" <= ExtendedQueries.Q67MaxEdit)
      .select($"a.c_custkey", $"b.c_custkey", $"ed")
      .as[(Long, Long, Int)].collect().toSet
    val salted = ExtendedQueries.fuzzyMatchPairs(names,
      hotThreshold = 20, salts = 4)
    assert(salted.as[(Long, Long, Int)].collect().toSet == plain)
    // exactly-once emission: no pair met in two grid cells
    assert(salted.count() == plain.size)
    assert(plain.size >= 90 * 89 / 2 / 10,
      "fixture must generate dense in-block matches") // sanity on the fixture
    // the occupancy probe fires on the dominant block only
    val hot = c.groupBy("blk").agg(count(lit(1)).as("sz"))
      .filter($"sz" > 20).collect()
    assert(hot.length == 1 && hot(0).getAs[Long]("sz") == 90)
    // the grid spreads the hot block: largest per-cell slice ≪ block size
    val maxCell = c.filter($"blk" === "AAAAAAAAAAAAAAAA")
      .withColumn("cell",
        pmod(xxhash64($"c_custkey"), lit(4L)).cast("int"))
      .groupBy("cell").count().agg(max("count")).head().getLong(0)
    assert(maxCell < 90 / 2, s"grid cell of $maxCell rows is not a spread")
    // grid decomposition is in the physical plan (not optimized away)
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("__gi"), "grid decomposition missing from plan")
    // and the REAL corpus stays on the cold path at the default
    // threshold: uniform TPC-H prefixes never trip the probe
    val realHot = Tables.table(spark, sf, "customer")
      .select(substring(col("c_name"), 1,
        ExtendedQueries.Q67BlockPrefix).as("blk"))
      .groupBy("blk").agg(count(lit(1)).as("sz"))
      .filter(col("sz") > ExtendedQueries.Q67HotBlockThreshold)
    assert(realHot.count() == 0,
      "TPC-H names must not trigger hot-block decomposition")
  }

  test("m11/m12: exact visual duplicates are always retrieved through " +
      "the IVF-PQ index at full recall") {
    val recall = Multimodal.visualDupRecallQuery(spark, sf).collect()
    assert(recall.nonEmpty, "fixture must contain duplicate images")
    // identical images have identical histogram vectors: same inverted
    // list, rank-1 probe covers it, ADC and exact cosine are maximal —
    // the index must never lose an exact duplicate
    assert(recall.forall(_.getAs[Boolean]("hit")),
      "an exact visual duplicate fell out of the top-3")
    // and m11's answers put a duplicate partner at cosine ~1.0
    val pairsSet = recall
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("partner"))).toSet
    val top = Multimodal.visualAnnQuery(spark, sf).collect()
    val hitRows = top.filter(r => pairsSet.contains(
      (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"))))
    assert(hitRows.nonEmpty)
    hitRows.foreach(r =>
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-9))
  }

  test("m13/m14: the audio index serves bounded top-3 per query and the " +
      "recall audit closes") {
    import graft.operators.Similarity
    val top = Multimodal.audioAnnQuery(spark, sf).collect()
    assert(top.nonEmpty)
    assert(top.forall(r =>
      r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 3))
    assert(top.groupBy(_.getAs[Long]("qid")).values.forall(_.length <= 3))
    assert(top.forall(r =>
      math.abs(r.getAs[Double]("cos_sim")) <= 1.0 + 1e-9))
    val rec = Multimodal.audioAnnRecallQuery(spark, sf).head()
    assert(rec.getAs[Long]("n_possible") == 3L * Similarity.NumQueries)
    val r3 = rec.getAs[Double]("recall_at_3")
    assert(r3 >= 0.0 && r3 <= 1.0)
    assert(math.abs(r3 - rec.getAs[Long]("n_hits").toDouble /
      rec.getAs[Long]("n_possible")) < 1e-12)
  }

  test("d09 suite: one shared shingle pass, fewer exchanges than three audits") {
    import graft.operators.Sampling
    import graft.tools.PlanAudit
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      PlanAudit.audit("x", PlanAudit.explainText(df)).shuffles
    // the three standalone audits each pay their own shingle pass
    val separate = shuffles(Dedup.ngramJaccard(spark, sf)) +
      shuffles(Dedup.containment(spark, sf)) +
      shuffles(Sampling.decontamination(spark, sf))
    // the suite's frames read ONE persisted shingle materialization: its
    // exchanges sit inside the InMemoryRelation (counted once, at cache
    // build) and every audit branch scans the cache
    val sh = Dedup.shingledDocs(spark, sf).persist()
    try {
      val frames = Sampling.shingleAuditFrames(spark, sf, sh)
      val union = frames.reduce(_.unionByName(_))
      val text = PlanAudit.explainText(union)
      assert(text.contains("InMemoryTableScan"),
        "suite branches must scan the shared cached shingle frame")
      val combined = shuffles(union)
      assert(combined < separate,
        s"suite ($combined shuffles) must beat separate audits ($separate)")
      // and the suite output itself matches the three standalone rollups
      val got = Sampling.shingleAuditSuite(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val d04 = Dedup.ngramJaccard(spark, sf).persist()
      val d08 = Dedup.containment(spark, sf).persist()
      val p05 = Sampling.decontamination(spark, sf).persist()
      try {
        assert(got("d04_jaccard_pairs") == ((d04.count(),
          d04.select("da").distinct().count(),
          d04.select("db").distinct().count())))
        assert(got("d08_containment_pairs") == ((d08.count(),
          d08.select("inner_id").distinct().count(),
          d08.select("outer_id").distinct().count())))
        assert(got("p05_decontamination") == ((p05.count(),
          p05.filter(col("contaminated")).count(),
          p05.agg(sum("n_shared_shingles")).head().getLong(0))))
      } finally { Seq(d04, d08, p05).foreach(_.unpersist()); () }
    } finally { sh.unpersist(); () }
  }

  test("materialized pair/cluster tables yield identical audit output") {
    // the 100-TB shape: d02 pairs / d06 labels are computed once per
    // corpus snapshot; every consumer reading the materialized table must
    // agree exactly with the self-computing oracle entries
    import graft.operators.{Sampling, TextAnalysis}
    val pairs = Dedup.minhashLsh(spark, sf).persist()
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toSeq).toSeq.sortBy(_.mkString("|"))
    try {
      assert(rows(TextAnalysis.sourceProfile(spark, sf, pairs)) ==
        rows(TextAnalysis.sourceProfile(spark, sf)))
      assert(rows(Sampling.splitLeakage(spark, sf, pairs)) ==
        rows(Sampling.splitLeakage(spark, sf)))
      assert(rows(TextAnalysis.sourceOverlap(spark, sf, pairs)) ==
        rows(TextAnalysis.sourceOverlap(spark, sf)))
      val cl = Dedup.clusters(spark, sf, pairs).persist()
      try {
        assert(rows(cl) == rows(Dedup.clusters(spark, sf)))
        assert(rows(Sampling.clusterSplit(spark, sf, cl)) ==
          rows(Sampling.clusterSplit(spark, sf)))
      } finally { cl.unpersist(); () }
    } finally { pairs.unpersist(); () }
  }

  test("p08 cluster split: near-dup pairs never straddle splits") {
    import graft.operators.{Dedup, Sampling}
    val assign = Sampling.clusterSplitAssign(spark, sf, Dedup.clusters(spark, sf))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val pairs = Dedup.minhashLsh(spark, sf)
      .select("da", "db").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    // leakage-free BY CONSTRUCTION — the property p03 can only audit
    pairs.foreach { case (a, b) => assert(assign(a) == assign(b)) }
    val total = Sampling.clusterSplit(spark, sf).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.table(spark, sf, "documents").count())
  }

  test("s08 filtered top-k: neighbors satisfy the predicate, ranks dense") {
    import graft.operators.Similarity
    val labels = Tables.table(spark, sf, "embeddings")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val rows = Similarity.filteredTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("qid"))
      assert(labels(r.getAs[Long]("qid")) == r.getAs[Int]("qlabel"))
      assert(labels(r.getAs[Long]("neighbor_id")) == r.getAs[Int]("qlabel"))
    }
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { qr =>
      assert(qr.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to qr.length))
    }
  }

  test("s07 PQ: ADC ranking keeps neighbors inside the query's planted cluster") {
    import graft.operators.Similarity
    // 16 near-orthogonal centers in 64 dims, planted EXACTLY at the
    // codebook-source ids (10..25); members are tight jitters. Quantized
    // scores cannot separate same-code members (that is the compression),
    // but they MUST preserve coarse geometry: every ADC top-3 neighbor
    // belongs to the query's cluster.
    val rnd = new scala.util.Random(77)
    val k = Similarity.PqK
    val dim = Similarity.Dim
    val per = 30
    val centers = Array.fill(k)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    def jit(c: Array[Float]) = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.04f)
    val rows =
      (0 until 10).map(q => (q.toLong, jit(centers(q)))) ++
      (0 until k).map(c => ((10 + c).toLong, centers(c))) ++
      (for (c <- 0 until k; i <- 0 until per)
        yield ((26 + c * per + i).toLong, jit(centers(c))))
    val e = Similarity.withNorm(rows.toDF("vec_id", "embedding")).cache()
    def cluster(id: Long): Long =
      if (id < 10) id else if (id < 26) id - 10 else (id - 26) / per
    val got = Similarity.pqRanked(e)
      .select("qid", "neighbor_id").as[(Long, Long)].collect()
    assert(got.length == 30)
    got.foreach { case (q, n) =>
      assert(cluster(n) == cluster(q), s"query $q got cross-cluster $n") }
  }

  test("d07 incremental matches are exactly the straddling all-pairs hits") {
    import graft.operators.Dedup
    val mod = Dedup.IncrementalMod
    val pairs = Dedup.minhashLsh(spark, sf)
      .select("da", "db").as[(Long, Long)].collect()
    val straddle = pairs.filter { case (a, b) => (a % mod == 0) != (b % mod == 0) }
      .map { case (a, b) => if (a % mod == 0) (a, b) else (b, a) }
    val inc = Dedup.incremental(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3)))
      .toMap
    // row per new doc, matched ⇔ it has a straddling near-dup pair
    assert(inc.keySet.forall(_ % mod == 0))
    val expected = straddle.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    expected.foreach { case (nid, iids) =>
      val (matched, n, best) = inc(nid)
      assert(matched && n == iids.length && iids.contains(best))
    }
    inc.foreach { case (nid, (matched, n, best)) =>
      if (!matched) assert(n == 0 && best == -1L && !expected.contains(nid))
    }
  }

  test("s07 PQ: codebook vectors encode to their own index; codes in range") {
    import graft.operators.Similarity
    val e = Similarity.withNorm(Tables.spread(spark, sf, "embeddings", "vec_id"))
    val codes = Similarity.pqCodes(e).cache()
    // a codebook-source vector is distance-0 to itself in every subspace,
    // so its code MUST be its own index — exactness proof for the argmin
    val self = codes
      .filter(col("vec_id") >= Similarity.NumQueries &&
        col("vec_id") < Similarity.NumQueries + Similarity.PqK)
    assert(self.filter(
      col("code") =!= (col("vec_id") - Similarity.NumQueries)).count() == 0)
    // every (vector, subspace) gets exactly one in-range code
    assert(codes.count() == e.count() * Similarity.PqM)
    assert(codes.filter(col("code").isNull || col("code") < 0 ||
      col("code") >= Similarity.PqK).count() == 0)
  }

  test("q40 full outer join keeps unmatched rows from both sides") {
    import graft.operators.CoreQueries
    val r = CoreQueries.q40JoinFullOuter(spark, sf).cache()
    // non-BUILDING customers with finished orders survive on the right
    assert(r.filter(!col("in_building") && col("n_f_orders") > 0).count() > 0)
    // exact union cardinalities: left side contributes every BUILDING
    // customer, right side every F-order customer outside the segment
    // (left-unmatched rows are additionally hash-checked by the oracle at
    // sf0.01 — at this SF every BUILDING customer happens to have one)
    val c = Tables.table(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val oCust = Tables.table(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
    assert(r.filter(col("in_building")).count() == c.count())
    assert(r.filter(!col("in_building")).count() ==
      oCust.join(c, oCust("o_custkey") === c("c_custkey"), "left_anti").count())
  }

  test("p07 domain mixture lands on target shares within count granularity") {
    import graft.operators.Sampling
    val rows = Sampling.domainMixture(spark, sf).collect()
    assert(rows.length == Sampling.MixTargetsPpm.length)
    val totalKept = rows.map(_.getAs[Long]("n_kept")).sum
    // achieved share can only be off by the ppm weight of ±2 documents
    // (one from `want`'s floor, one from achieved_ppm's floor)
    val tol = 2L * 1000000L / totalKept + 1
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(math.abs(r.getAs[Long]("achieved_ppm") -
        r.getAs[Long]("target_ppm")) <= tol,
        s"${r.getAs[String]("lang")}: achieved ${r.getAs[Long]("achieved_ppm")}" +
          s" vs target ${r.getAs[Long]("target_ppm")} (tol $tol)")
    }
  }

  test("t10 vocab: ranks dense, frequencies non-increasing, shares monotone") {
    import graft.operators.TextAnalysis
    // operator output is unsorted (canonical order is SparkEntry.canon's job)
    val rows = TextAnalysis.vocab(spark, sf).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.nonEmpty && rows.length <= TextAnalysis.VocabTopK)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last <= 1.0 + 1e-12)
    rows.foreach(r => assert(r.getAs[Long]("df") >= 1 &&
      r.getAs[Long]("freq") >= r.getAs[Long]("df")))
  }

  test("d21: NFC normalization coalesces composed and decomposed forms") {
    import graft.functions.NfcNormalize
    // golden: e-acute composed (U+00E9) vs decomposed (U+0065 U+0301) —
    // escape sequences so no editor/encoding pass can normalize them away
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    assert(composed != decomposed)
    assert(NfcNormalize.compute(composed) == NfcNormalize.compute(decomposed))
    // the ASCII fast path returns the same instance — no allocation
    val ascii = "plain ascii text"
    assert(NfcNormalize.compute(ascii) eq ascii)
    // codegen Column path: the two accent encodings group together
    val df = Seq((1L, "r\u00e9sum\u00e9"), (2L, "re\u0301sume\u0301"),
      (3L, "resume")).toDF("doc_id", "text")
    val grouped = df
      .groupBy(NfcNormalize.nfc_normalize(col("text")).as("n"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("c"))
      .collect()
    assert(grouped.length == 2)
    assert(grouped.find(_.getAs[Long]("c") == 2).get.getAs[Long]("rep") == 1L)
    // live-corpus d21 is a refinement of d01: normalization can only
    // merge groups, every group keeps >= 1 raw variant, mass conserves
    val nDocs = Tables.table(spark, sf, "documents").count()
    val d21 = Dedup.nfcDedup(spark, sf).collect()
    assert(d21.length <= Dedup.exact(spark, sf).count())
    assert(d21.map(_.getAs[Long]("n_copies")).sum == nDocs)
    d21.foreach { r =>
      assert(r.getAs[Long]("n_raw_variants") >= 1)
      assert(r.getAs[Long]("n_raw_variants") <= r.getAs[Long]("n_copies"))
    }
  }

  test("d22: canonical key coalesces case, whitespace, punctuation, " +
      "and accent-encoding variants") {
    import graft.operators.{Dedup, TextPrep}
    // goldens: one logical document under the variant axes the canonical
    // ladder must flatten — case, whitespace runs, punctuation, composed
    // vs decomposed accents — plus a token-REORDER which must NOT merge
    // (that is d12's bag rung, one step further down the ladder)
    val df = Seq(
      (1L, "Caf\u00e9 du Monde, New Orleans!"),   // composed accent
      (2L, "cafe\u0301 du  monde   new orleans"), // decomposed + ws + case
      (3L, "CAF\u00c9 DU MONDE -- NEW ORLEANS"),  // upper + punct run
      (4L, "monde du caf\u00e9 new orleans"),     // reorder: stays separate
      (5L, "an unrelated document")
    ).toDF("doc_id", "text")
    val keys = df.select(col("doc_id"),
        TextPrep.canonicalKey(col("text")).as("ck"))
      .as[(Long, String)].collect().toMap
    assert(keys(1L) == "caf\u00e9 du monde new orleans")
    assert(keys(2L) == keys(1L) && keys(3L) == keys(1L))
    assert(keys(4L) != keys(1L) && keys(5L) != keys(1L))
    // live-corpus d22 is a refinement of d21 which refines d01: each
    // ladder rung can only merge groups, and copy mass conserves
    val nDocs = Tables.table(spark, sf, "documents").count()
    val d22 = Dedup.canonicalDedup(spark, sf).collect()
    assert(d22.length <= Dedup.nfcDedup(spark, sf).count())
    assert(d22.map(_.getAs[Long]("n_copies")).sum == nDocs)
    d22.foreach { r =>
      assert(r.getAs[Long]("n_nfc_variants") >= 1)
      assert(r.getAs[Long]("n_nfc_variants") <= r.getAs[Long]("n_raw_variants"))
      assert(r.getAs[Long]("n_raw_variants") <= r.getAs[Long]("n_copies"))
    }
  }

  test("d23 winnowing: the shared-run guarantee holds and selection is " +
      "insertion-robust") {
    import graft.operators.Dedup
    // a 20-token run embedded in two different documents — far above the
    // k+w-1 = 6-token guarantee threshold, so the pair MUST surface
    val run = (1 to 20).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"completely different prefix words here $run and other tail"),
      (3L, "unrelated text with nothing shared at all beyond plain words"),
      // doc 4 = doc 1 with ONE token inserted mid-run: winnowing must
      // still pair it with 1 and 2 (d16's fixed windows all shift)
      (4L, s"alpha beta gamma ${(1 to 9).map(i => s"run$i").mkString(" ")} " +
        s"INSERTED ${(10 to 20).map(i => s"run$i").mkString(" ")} delta")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairsOf(docs).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairs.contains((1L, 2L)), s"guaranteed pair missing: $pairs")
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)),
      s"insertion broke winnowing robustness: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not pair")
    // density: per-doc fingerprints are a strict subset of the shingle
    // positions — at most one per full window start, at least one total
    val fps = Dedup.winnowFingerprints(docs).collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    docs.select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .collect().foreach { r =>
        val nWindows = r.getAs[Int]("n") - Dedup.WinnowK + 1 -
          (Dedup.WinnowW - 1)
        val got = fps.getOrElse(r.getAs[Long]("doc_id"), 0)
        assert(got >= 1 && got <= nWindows,
          s"doc ${r.getAs[Long]("doc_id")}: $got fps vs $nWindows windows")
      }
    // live corpus: pairs exist and every reported pair shares >= the
    // configured fingerprint count
    val live = Dedup.winnowPairs(spark, sf).collect()
    assert(live.nonEmpty)
    live.foreach(r =>
      assert(r.getAs[Long]("n_shared") >= Dedup.WinnowMinShared))
  }

  test("d22 canonical key: idempotent and invariant under random " +
      "case/whitespace/punctuation perturbation") {
    import graft.operators.TextPrep
    val rnd = new scala.util.Random(42)
    val words = Vector("café", "naïve", "data", "spark", "α", "mixed", "42")
    val base = Seq.tabulate(100) { _ =>
      Seq.fill(1 + rnd.nextInt(8))(words(rnd.nextInt(words.size)))
        .mkString(" ")
    }
    // a canonical-equivalent perturbation: random upcasing, whitespace
    // runs, injected ASCII punctuation, trailing punctuation
    def perturb(s: String): String = s.flatMap {
      case ' ' => if (rnd.nextBoolean()) "  ,  " else " "
      case c => if (rnd.nextBoolean()) c.toUpper.toString else c.toString
    } + (if (rnd.nextBoolean()) "!!" else "")
    val df = base.map(s => (s, perturb(s))).toDF("orig", "pert")
    val rows = df.select(
        TextPrep.canonicalKey(col("orig")).as("k1"),
        TextPrep.canonicalKey(col("pert")).as("k2"),
        TextPrep.canonicalKey(TextPrep.canonicalKey(col("orig"))).as("kk"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"perturbation changed the key: '${r.getString(0)}' vs '${r.getString(1)}'")
      assert(r.getString(0) == r.getString(2), "canonicalKey not idempotent")
    }
  }

  test("q54: explicit mode and discrete median match a plain recompute") {
    import graft.operators.ExtendedQueries
    val got = ExtendedQueries.q54ModeMedian(spark, sf).collect()
      .map(r => r.getAs[String]("flag") -> r).toMap
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val rows = Tables.table(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").as[(String, Double)].collect()
      .groupBy(_._1)
    assert(got.keySet == rows.keySet && got.nonEmpty)
    rows.foreach { case (flag, xs) =>
      val counts = xs.map(x => d2(x._2)).groupBy(identity)
        .map { case (q, g) => q -> g.size.toLong }
      val (modeQ, modeC) = counts.toSeq
        .sortBy { case (q, c) => (-c, q) }.head
      val sorted = xs.map(x => d2(x._2)).sorted
      val median = sorted((sorted.size - 1) / 2 + (1 - sorted.size % 2))
      // percentile_disc(0.5): smallest value with 2*cum >= n, i.e. the
      // ceil(n/2)-th order statistic
      val medianDisc = sorted((sorted.size + 1) / 2 - 1)
      val r = got(flag)
      assert(r.getAs[Double]("mode_qty") == modeQ.toDouble)
      assert(r.getAs[Long]("mode_count") == modeC)
      assert(r.getAs[Double]("median_qty") == medianDisc.toDouble,
        s"flag $flag (sanity alt: $median)")
    }
  }

  test("p20 snapshot diff: statuses land exactly on the simulation slots") {
    import graft.operators.Sampling
    val got = Sampling.snapshotDiff(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    val n = Tables.table(spark, sf, "documents").count()
    assert(got.size == n) // the union of both snapshots covers every doc
    got.foreach { case (id, status) =>
      val expected = (id % 10) match {
        case Sampling.DiffAddedSlot   => "added"
        case Sampling.DiffRemovedSlot => "removed"
        case Sampling.DiffEditedSlot  => "changed"
        case _                        => "retained"
      }
      assert(status == expected, s"doc $id: $status != $expected")
    }
    // all four classes actually occur on the fixture
    assert(got.values.toSet ==
      Set("added", "removed", "changed", "retained"))
  }

  test("p20 snapshot diff: null-text documents fingerprint on BOTH sides") {
    // advisor r8: an asymmetric coalesce made fp_curr NULL for null
    // texts, misclassifying a doc present in both snapshots as 'removed'
    import graft.operators.Sampling
    val dir = java.nio.file.Files.createTempDirectory("p20-null").toString
    val retainedId = 10L + 0L // slot 0: present in both, unchanged
    val editedId = 10L + Sampling.DiffEditedSlot
    Seq((retainedId, null: String), (editedId, null: String),
        (1L, "plain text"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = Sampling.snapshotDiff(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got(retainedId) == "retained", got.toString)
    assert(got(editedId) == "changed", got.toString)
    assert(got(1L) == "retained")
  }

  test("s16 refine: chooses from s15's candidates and never loses recall") {
    import graft.operators.Similarity
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"))).toSet
    val refined = Similarity.ivfPqRefineTopK(spark, sf)
    val rows = refined.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.size))
      assert(rs.size <= 3)
    }
    // exact re-scores stay in cosine range
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
    // among the SAME retrieved candidates, ranking by the true metric
    // can only match or beat the ADC ranking against the exact truth
    val truth = pairs(Similarity.bruteForceTopK(spark, sf)
      .filter(col("rank") <= 3))
    val adc = pairs(Similarity.ivfPqTopK(spark, sf))
    val ref = rows
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"))).toSet
    assert(ref.intersect(truth).size >= adc.intersect(truth).size,
      "refine lost recall vs the raw ADC top-3")
  }

  test("s17: ingest into frozen artifacts equals a scratch build on the " +
      "union; audit accounting closes") {
    import graft.operators.Similarity
    val e = Similarity.embeddings(spark, sf)
    val members = e.filter(col("vec_id") >= Similarity.NumQueries)
    val isNew = col("vec_id") % Similarity.IngestMod === Similarity.IngestRem
    val existing = members.filter(!isNew)
    val batch = members.filter(isNew)
    val cents = Similarity.centsOf(existing)
    val cb = Similarity.pqCodebook(existing)
    // assignment through FIXED centroids is per-vector: incremental
    // (existing-then-batch) union equals one scratch pass over the union
    def assignSet(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssign(df, cents).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"))).toSet
    val incremental = assignSet(existing) ++ assignSet(batch)
    val scratch = assignSet(members)
    assert(incremental == scratch && scratch.nonEmpty)
    // same for PQ codes through the FIXED codebook
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqCodesFor(df, cb, Similarity.PqM, Similarity.PqSubDim)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("m"),
          r.getAs[Int]("code"))).toSet
    assert(codeSet(existing) ++ codeSet(batch) == codeSet(members))
    // the maintenance audit's accounting closes against the raw counts
    val audit = Similarity.ivfPqIngest(spark, sf).collect()
    assert(audit.nonEmpty)
    assert(audit.map(_.getAs[Long]("n_before")).sum == existing.count())
    assert(audit.map(_.getAs[Long]("n_added")).sum == batch.count())
    audit.foreach { r =>
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") + r.getAs[Long]("n_added"))
    }
    // shares on each side each sum to 1
    assert(math.abs(audit.map(_.getAs[Double]("share_before")).sum - 1.0)
      < 1e-9)
    assert(math.abs(audit.map(_.getAs[Double]("share_after")).sum - 1.0)
      < 1e-9)
    // the recall row is internally consistent and bounded
    val rec = Similarity.ivfPqIngestRecall(spark, sf).head()
    assert(rec.getAs[Long]("n_possible") == 3L * Similarity.NumQueries)
    val r3 = rec.getAs[Double]("recall_at_3")
    assert(r3 >= 0.0 && r3 <= 1.0)
    assert(math.abs(rec.getAs[Double]("recall_delta") -
      (r3 - rec.getAs[Double]("baseline_recall_at_3"))) < 1e-12)
    // the rebuild decision consumes the delta deterministically: a
    // tolerance wider than any possible loss never triggers, a negative
    // tolerance always does (when any loss exists) or never (when the
    // frozen artifacts match/beat baseline)
    assert(!Similarity.shouldRebuild(spark, sf, maxRecallLoss = 1.0))
    val delta = rec.getAs[Double]("recall_delta")
    assert(Similarity.shouldRebuild(spark, sf, maxRecallLoss = -2.0)
      == (-delta > -2.0))
  }

  test("s17c/s18c/s20c/s21c: persisted-artifact audits equal their " +
      "derive twins and never re-derive the quantizers") {
    import graft.operators.Similarity
    import org.apache.spark.sql.execution._
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    // scan counter against a path substring, descending through AQE
    // wrappers (the CorpusShardSink proof pattern, applied to counting)
    def scansOf(df: org.apache.spark.sql.DataFrame, substr: String): Int = {
      def go(p: SparkPlan): Int = p match {
        case a: adaptive.AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: adaptive.QueryStageExec => go(q.plan)
        case f: FileSourceScanExec =>
          (if (f.relation.location.rootPaths
            .exists(_.toString.contains(substr))) 1 else 0)
        case p => p.children.map(go).sum
      }
      go(df.queryExecution.executedPlan)
    }
    val planPairs = Seq(
      ("s17", Similarity.ivfPqIngest(spark, sf),
        Similarity.ivfPqIngestArtifacts(spark, sf)),
      ("s18", Similarity.ivfPqDelete(spark, sf),
        Similarity.ivfPqDeleteArtifacts(spark, sf)),
      ("s20", Similarity.ivfPqShardMerge(spark, sf),
        Similarity.ivfPqShardMergeArtifacts(spark, sf)))
    planPairs.foreach { case (name, derive, art) =>
      assert(rows(derive) == rows(art), s"$name artifact path must be " +
        "value-identical to the derive path")
      // the frozen tables come from the artifact store, not the corpus:
      // the artifact plan scans the store and pays strictly fewer
      // corpus scans (the quantizer-derivation branches are gone)
      assert(scansOf(art, "graft-artifacts") >= 2,
        s"$name artifact path must scan the persisted cents+cb")
      assert(scansOf(art, "embeddings.parquet") <
        scansOf(derive, "embeddings.parquet"),
        s"$name artifact path must not re-derive quantizers from the corpus")
    }
    // s21 eagerly materializes (evictAfter), so its plan is a checkpoint
    // leaf — value equality is the provable contract
    assert(rows(Similarity.filteredAnnAudit(spark, sf)) ==
      rows(Similarity.filteredAnnAuditArtifacts(spark, sf)))
  }

  test("artifact cache invalidates when the corpus changes: a " +
      "regenerated corpus at the same path yields a fresh artifact root") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files
      .createTempDirectory("graft-art-inval").toString
    def writeCorpus(n: Int): Unit =
      (0 until n).map(_.toLong).toDF("vec_id")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def train = Similarity.embeddings(spark, sf)
    writeCorpus(4)
    val root1 = Similarity.ensureArtifacts(spark, dir, "inval", train)
    // same bytes → same root, and the second call is a pure cache read
    assert(Similarity.ensureArtifacts(spark, dir, "inval", train) == root1)
    // regenerate the corpus in place (different content → different file
    // sizes) — the old path-keyed cache would silently serve the stale
    // quantizers; the fingerprint key must miss
    writeCorpus(64)
    val root2 = Similarity.ensureArtifacts(spark, dir, "inval", train)
    assert(root2 != root1,
      "a regenerated corpus must not reuse stale artifacts")
    val (c, cb) = Similarity.loadArtifacts(spark, root2)
    assert(c.count() > 0 && cb.count() > 0)
    // the fresh fingerprint RETIRES the superseded root — regeneration
    // must not accumulate stale quantizer copies under the temp root
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root1)),
      "superseded artifact root must be garbage-collected")
  }

  test("s18: compacting tombstones equals a rebuild on survivors; " +
      "deleted vectors never serve; audit accounting closes") {
    import graft.operators.Similarity
    val e = Similarity.embeddings(spark, sf)
    val members = e.filter(col("vec_id") >= Similarity.NumQueries)
    val survivors = members.filter(!Similarity.isTombstoned)
    val tombIds = members.filter(Similarity.isTombstoned)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(tombIds.nonEmpty)
    val cents = Similarity.centsOf(e)
    val cb = Similarity.pqCodebook(e)
    // compaction is row-dropping: survivors' codes through the FROZEN
    // codebook equal the full encode minus the tombstoned rows — no
    // survivor is ever re-encoded by a delete
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqCodesFor(df, cb, Similarity.PqM, Similarity.PqSubDim)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("m"),
          r.getAs[Int]("code"))).toSet
    assert(codeSet(survivors) ==
      codeSet(members).filterNot(c => tombIds(c._1)))
    // same for list assignment through the FROZEN centroids — even where
    // a tombstone was a centroid's source row (the stride and the
    // delete residue overlap by construction), the centroid survives
    def assignSet(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssign(df, cents).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"))).toSet
    assert(assignSet(survivors) ==
      assignSet(members).filterNot(a => tombIds(a._1)))
    // the delete actually propagates: no tombstoned id ever serves as a
    // neighbor post-compaction
    val served = Similarity.ivfPqDeleteServe(spark, sf).collect()
    assert(served.nonEmpty)
    served.foreach(r => assert(!tombIds(r.getAs[Long]("neighbor_id"))))
    // the compaction audit's accounting closes against the raw counts
    val audit = Similarity.ivfPqDelete(spark, sf).collect()
    assert(audit.map(_.getAs[Long]("n_before")).sum == members.count())
    assert(audit.map(_.getAs[Long]("n_removed")).sum == tombIds.size)
    audit.foreach { r =>
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_removed"))
      assert(r.getAs[Long]("n_after") >= 0L)
    }
    assert(math.abs(audit.map(_.getAs[Double]("share_before")).sum - 1.0)
      < 1e-9)
    assert(math.abs(audit.map(_.getAs[Double]("share_after")).sum - 1.0)
      < 1e-9)
  }

  test("s20: shard-built lists merge by concatenation — the union of " +
      "per-shard encodes is bit-identical to the one-shot build") {
    import graft.operators.Similarity
    val e = Similarity.embeddings(spark, sf)
    val members = e.filter(col("vec_id") >= Similarity.NumQueries)
    val shard0 = members.filter(col("vec_id") % Similarity.ShardMod === 0)
    val shard1 = members.filter(col("vec_id") % Similarity.ShardMod === 1)
    val cents = Similarity.centsOf(e)
    val cb = Similarity.pqCodebook(e)
    def assignSet(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssign(df, cents).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"))).toSet
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqCodesFor(df, cb, Similarity.PqM, Similarity.PqSubDim)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("m"),
          r.getAs[Int]("code"))).toSet
    val (a0, a1) = (assignSet(shard0), assignSet(shard1))
    assert(a0.nonEmpty && a1.nonEmpty)
    assert((a0 ++ a1) == assignSet(members))
    assert((codeSet(shard0) ++ codeSet(shard1)) == codeSet(members))
    // the merge-planner audit closes: shard contributions concatenate
    val audit = Similarity.ivfPqShardMerge(spark, sf).collect()
    audit.foreach { r =>
      assert(r.getAs[Long]("n_merged") ==
        r.getAs[Long]("n_shard0") + r.getAs[Long]("n_shard1"))
      assert(r.getAs[Long]("code_mass_merged") ==
        r.getAs[Long]("code_mass_shard0") +
          r.getAs[Long]("code_mass_shard1"))
    }
    assert(audit.map(_.getAs[Long]("n_merged")).sum == members.count())
  }

  test("q67 fuzzy match: equals a plain-Scala blocked-Levenshtein " +
      "mirror; blocking excludes near pairs across blocks") {
    import graft.operators.ExtendedQueries
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.table(spark, sf, "customer")
      .select("c_custkey", "c_name").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_name"))
    val expected = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb &&
        na.take(ExtendedQueries.Q67BlockPrefix) ==
          nb.take(ExtendedQueries.Q67BlockPrefix) &&
        lev(na, nb) <= ExtendedQueries.Q67MaxEdit
    } yield (ka, kb, lev(na, nb))).toSet
    val got = ExtendedQueries.q67FuzzyMatch(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_key"), r.getAs[Long]("b_key"),
        r.getAs[Int]("edit_dist"))).toSet
    assert(got == expected && got.nonEmpty)
    // the blocking is doing real work: some cross-block pair sits within
    // the edit budget but is (correctly, by design) not emitted
    val crossBlock = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb &&
        na.take(ExtendedQueries.Q67BlockPrefix) !=
          nb.take(ExtendedQueries.Q67BlockPrefix) &&
        lev(na, nb) <= ExtendedQueries.Q67MaxEdit
    } yield (ka, kb)).headOption
    assert(crossBlock.nonEmpty,
      "fixture should contain a near pair straddling blocks")
    crossBlock.foreach { case (ka, kb) =>
      assert(!got.exists(p => p._1 == ka && p._2 == kb))
    }
  }

  test("q69 SCD2: intervals chain per entity, the current slice IS q03's " +
      "latest state, and a point-in-time read matches log replay") {
    import graft.operators.CoreQueries
    val hist = CoreQueries.q69Scd2History(spark, sf).collect()
    assert(hist.nonEmpty)
    hist.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("valid_from_us"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // every non-final version is closed, at or before the next opens
          assert(!a.isNullAt(a.fieldIndex("valid_to_us")))
          assert(a.getAs[Long]("valid_to_us") <=
            b.getAs[Long]("valid_from_us"))
        case _ => ()
      }
      assert(rows.count(_.getAs[Boolean]("is_current")) <= 1)
    }
    // duality: the open versions ARE q03's materialized latest state
    val current = hist.filter(_.getAs[Boolean]("is_current"))
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("version_event_id"), r.getAs[String]("state_type"),
        r.getAs[Double]("state_value"))).toSet
    val q03 = CoreQueries.q03LatestState(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("last_event_id"),
        r.getAs[String]("last_event_type"),
        r.getAs[Double]("last_value"))).toSet
    assert(current == q03 && q03.nonEmpty)
    // point-in-time: the interval containing t equals replaying the log
    // up to t (deletes erase the entity)
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts_us").collect()
    val t = ev.map(_.getAs[Long]("ts_us")).sorted.apply(ev.length / 2)
    val pit = hist.filter(r => r.getAs[Long]("valid_from_us") <= t &&
        (r.isNullAt(r.fieldIndex("valid_to_us")) ||
          r.getAs[Long]("valid_to_us") > t))
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("version_event_id")).toMap
    val replay = ev.filter(_.getAs[Long]("ts_us") <= t)
      .groupBy(_.getAs[Long]("user_id")).flatMap { case (u, es) =>
        val last = es.maxBy(e =>
          (e.getAs[Long]("ts_us"), e.getAs[Long]("event_id")))
        if (last.getAs[String]("event_type") == "error") None
        else Some(u -> last.getAs[Long]("event_id"))
      }.toMap
    assert(pit == replay)
  }

  test("q70: every purchase gets the uniquely-covering prior version — " +
      "the immediately-preceding non-delete event, else a null prior") {
    import graft.operators.CoreQueries
    val got = CoreQueries.q70PitJoin(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts_us").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("ts_us")))
    val purchases = ev.filter(_._3 == "purchase")
    // the covering interval is unique: exactly one row per fact
    assert(got.length == purchases.length && purchases.nonEmpty)
    val byUser = ev.groupBy(_._1)
    val gotBy = got.map(r => r.getAs[Long]("purchase_event_id") -> r).toMap
    purchases.foreach { case (u, pid, _, ts) =>
      val before = byUser(u).filter(_._4 < ts)
      val expected = (if (before.isEmpty) None
        else Some(before.maxBy(e => (e._4, e._2))))
        .filter(_._3 != "error").map(_._2)
      val r = gotBy(pid)
      val gotPrior =
        if (r.isNullAt(r.fieldIndex("prior_event_id"))) None
        else Some(r.getAs[Long]("prior_event_id"))
      assert(gotPrior == expected, s"purchase $pid expected $expected")
    }
    // both outcomes occur in the fixture: enriched facts AND null priors
    assert(got.exists(_.isNullAt(got.head.fieldIndex("prior_event_id"))))
    assert(got.exists(!_.isNullAt(got.head.fieldIndex("prior_event_id"))))
  }

  test("d25: the quality keeper dominates the min-id keeper and is the " +
      "exact per-cluster argmax") {
    import graft.operators.{Dedup, TextAnalysis}
    val rows = Dedup.qualityKeeper(spark, sf).collect()
    assert(rows.nonEmpty)
    val quality = TextAnalysis.quality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score"))
      .toMap
    val labels = Dedup.clusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
    val members = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(rows.map(_.getAs[Long]("n_members")).sum == labels.length)
    rows.foreach { r =>
      val (cl, keeper) = (r.getAs[Long]("cluster"), r.getAs[Long]("keeper_id"))
      // the chosen keeper is a member and IS the (score desc, id asc) argmax
      val ms = members(cl)
      assert(ms.contains(keeper))
      assert(keeper == ms.minBy(d => (-quality(d), d)))
      // argmax quality can never lose to the min-id member's quality
      assert(r.getAs[Double]("keeper_quality") >=
        r.getAs[Double]("minid_quality"))
      assert(r.getAs[Double]("keeper_quality") == quality(keeper))
      assert(r.getAs[Boolean]("keeper_differs") == (keeper != cl))
    }
  }

  test("q68: fuzzy pairs resolve to entities — min key is the id, " +
      "exactly one canonical member, pair endpoints co-resolve") {
    import graft.operators.ExtendedQueries
    val labels = ExtendedQueries.q68EntityClusters(spark, sf).collect()
    assert(labels.nonEmpty)
    labels.groupBy(_.getAs[Long]("entity_id")).foreach {
      case (eid, members) =>
        assert(members.map(_.getAs[Long]("c_custkey")).min == eid)
        val canon = members.filter(_.getAs[Boolean]("is_canonical"))
        assert(canon.length == 1 &&
          canon.head.getAs[Long]("c_custkey") == eid)
    }
    val ent = labels.map(r =>
      r.getAs[Long]("c_custkey") -> r.getAs[Long]("entity_id")).toMap
    val pairs = ExtendedQueries.q67FuzzyMatch(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(p =>
      assert(ent(p.getAs[Long]("a_key")) == ent(p.getAs[Long]("b_key")),
        "a match pair's endpoints resolved to different entities"))
  }

  test("s21: pre-filter dominates post-filter in answers returned and " +
      "scores only the matching candidates") {
    import graft.operators.Similarity
    val rows = Similarity.filteredAnnAudit(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("prefilter", "postfilter"))
    val (pre, post) = (rows("prefilter"), rows("postfilter"))
    val nTruth = pre.getAs[Long]("n_truth")
    assert(nTruth == post.getAs[Long]("n_truth") && nTruth > 0)
    Seq(pre, post).foreach { r =>
      assert(r.getAs[Long]("n_retrieved") <= 3L * Similarity.NumQueries)
      assert(r.getAs[Long]("n_hits") <=
        math.min(r.getAs[Long]("n_retrieved"), nTruth))
      assert(math.abs(r.getAs[Double]("recall_vs_exact") -
        r.getAs[Long]("n_hits").toDouble / nTruth) < 1e-12)
      assert(r.getAs[Double]("mean_candidates_per_query") >= 0.0)
    }
    // per query, the matches inside the top-RefineK are a subset of the
    // matches inside the probed lists — post-filter can never return
    // MORE than pre-filter, and never scores fewer candidates
    assert(post.getAs[Long]("n_retrieved") <= pre.getAs[Long]("n_retrieved"))
    assert(post.getAs[Double]("mean_candidates_per_query") >=
      pre.getAs[Double]("mean_candidates_per_query"))
  }

  test("s19 dim sweep: full width anchors recall at 1, the recommended " +
      "row follows the retention rule") {
    import graft.operators.{Dedup, Similarity}
    val rows = Similarity.dimTuningSweep(spark, sf).collect()
      .sortBy(_.getAs[Int]("dims"))
    assert(rows.map(_.getAs[Int]("dims")).toSeq == Similarity.DimSweep)
    rows.foreach { r =>
      val rc = r.getAs[Double]("recall_at_3")
      assert(rc >= 0.0 && rc <= 1.0)
      assert(r.getAs[Long]("bytes_per_vec") == 4L * r.getAs[Int]("dims"))
      assert(r.getAs[Long]("n_possible") == 3L * Similarity.NumQueries)
    }
    // truncating to the FULL width is the identity search
    assert(rows.last.getAs[Int]("dims") == Similarity.Dim)
    assert(rows.last.getAs[Double]("recall_at_3") == 1.0)
    // the recommended row is the cheapest retaining >= 95% of best
    val qmax = rows.map(_.getAs[Double]("recall_at_3")).max
    val eligible = rows.filter(
      _.getAs[Double]("recall_at_3") >= Dedup.SweepRetention * qmax)
    val rec = rows.filter(_.getAs[Boolean]("recommended"))
    assert(rec.length == 1)
    assert(rec.head.getAs[Int]("dims") ==
      eligible.minBy(_.getAs[Long]("bytes_per_vec")).getAs[Int]("dims"))
    assert(Similarity.recommendedDims(spark, sf) ==
      rec.head.getAs[Int]("dims"))
  }

  test("q52 moments: identity-form stats agree with Spark's built-ins") {
    import graft.operators.ExtendedQueries
    val got = ExtendedQueries.q52StatsMoments(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    // the built-ins are the semantic reference (approximately — they
    // stream float partials); the exact-sum identity must land within
    // float-accumulation distance of them
    val ref = Tables.table(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), var_pop(col("l_quantity")).as("v"),
        stddev_pop(col("l_quantity")).as("sd"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("cv"),
        corr(col("l_quantity"), col("l_extendedprice")).as("cr"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    def close(a: Double, b: Double) =
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    got.foreach { case (k, g) =>
      val r = ref(k)
      assert(g.getAs[Long]("n") == r.getAs[Long]("n"))
      assert(close(g.getAs[Double]("var_qty"), r.getAs[Double]("v")))
      assert(close(g.getAs[Double]("stddev_qty"), r.getAs[Double]("sd")))
      assert(close(g.getAs[Double]("cov_qty_price"), r.getAs[Double]("cv")))
      assert(close(g.getAs[Double]("corr_qty_price"), r.getAs[Double]("cr")))
      val c = g.getAs[Double]("corr_qty_price")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
  }

  test("q51 gapfill: dense spine, LOCF carries, interpolation brackets") {
    import graft.operators.ExtendedQueries
    val rows = ExtendedQueries.q51GapfillInterpolate(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs0) =>
      val rs = rs0.sortBy(_.getAs[Long]("h"))
      // dense spine with observed endpoints
      val hs = rs.map(_.getAs[Long]("h"))
      assert(hs.toSeq == (hs.head to hs.last).toSeq)
      assert(rs.head.getAs[Int]("present") == 1)
      assert(rs.last.getAs[Int]("present") == 1)
      var lastObserved = Double.NaN
      rs.foreach { r =>
        val locf = r.getAs[Double]("locf_sum")
        val interp = r.getAs[Double]("interp_sum")
        if (r.getAs[Int]("present") == 1) {
          assert(r.getAs[Long]("n_events") > 0)
          // at an observation both reconstructions ARE the observation
          assert(locf == interp)
          lastObserved = locf
        } else {
          assert(r.getAs[Long]("n_events") == 0)
          // LOCF carries the previous observation unchanged
          assert(locf == lastObserved)
          // linear interpolation stays inside the bracketing values
          val next = rs.dropWhile(_.getAs[Long]("h") <= r.getAs[Long]("h"))
            .find(_.getAs[Int]("present") == 1).get.getAs[Double]("locf_sum")
          val (lo, hi) = (math.min(lastObserved, next),
            math.max(lastObserved, next))
          assert(interp >= lo - 1e-9 && interp <= hi + 1e-9)
        }
      }
    }
  }

  test("q49: disjunctive revenue matches a plain-Scala recompute") {
    import graft.operators.ExtendedQueries
    val r = ExtendedQueries.q49DisjunctiveRevenue(spark, sf).head()
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val parts = Tables.table(spark, sf, "part")
      .select("p_partkey", "p_brand", "p_size")
      .as[(Long, String, Int)].collect()
      .map(p => p._1 -> ((p._2, p._3))).toMap
    val kept = Tables.table(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double, Double)].collect()
      .filter { case (pk, qty, _, _) =>
        parts.get(pk).exists { case (brand, size) =>
          (brand == "Brand#1" && qty >= 1 && qty <= 11 && size <= 5) ||
          (brand == "Brand#2" && qty >= 10 && qty <= 20 && size <= 10) ||
          (brand == "Brand#3" && qty >= 20 && qty <= 30 && size <= 15)
        }
      }
    val expected = kept.map { case (_, _, px, dx) =>
      d2(px) * (BigDecimal(1) - d2(dx)) }.sum.toDouble
    assert(r.getAs[Long]("n_lines") == kept.length)
    assert(r.getAs[Double]("revenue") == expected)
  }

  test("q50: custdist keeps zero-order customers and partitions the count") {
    import graft.operators.ExtendedQueries
    val rows = ExtendedQueries.q50CustDist(spark, sf).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist"))
    val nCust = Tables.table(spark, sf, "customer").count()
    // every customer lands in exactly one bucket
    assert(rows.map(_._2).sum == nCust)
    val perCust = Tables.table(spark, sf, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").as[Long].collect()
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val zeros = nCust - perCust.size
    val expected = (perCust.values.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong } ++
      (if (zeros > 0) Map(0L -> zeros) else Map.empty))
      .toSeq.sortBy { case (k, n) => (-n, -k) }
    // operator returns an unsorted distributed frame (r16: canonical
    // order is the harness tail's concern) — compare order-insensitively
    assert(rows.toSeq.sortBy { case (k, n) => (-n, -k) } == expected)
  }

  test("q55-q58: decorrelated quantifier semantics hold on the live corpus") {
    import graft.operators.ExtendedQueries
    // q55: every row's price IS the regional minimum for its part, and
    // the candidate row set is distinct
    val asia = Tables.table(spark, sf, "lineitem")
      .join(Tables.table(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.table(spark, sf, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.table(spark, sf, "region")
        .filter(col("r_name") === ExtendedQueries.Q55Region),
        col("n_regionkey") === col("r_regionkey"))
      .select("l_partkey", "l_extendedprice")
      .as[(Long, Double)].collect()
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
    val q55 = ExtendedQueries.q55MinCostSupplier(spark, sf).collect()
    assert(q55.nonEmpty && q55.length == q55.distinct.length)
    q55.foreach { r =>
      assert(r.getAs[Double]("min_price") ==
        asia(r.getAs[Long]("p_partkey")), r.toString)
    }
    // q56: the reported suppliers all carry the view's exact max revenue
    val q56 = ExtendedQueries.q56TopSupplierRevenue(spark, sf).collect()
    assert(q56.nonEmpty)
    val revs = q56.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, s"non-tied rows reported: ${revs.toSeq}")
    // q57: no excluded (negative-balance) supplier contributes
    val excluded = Tables.table(spark, sf, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
      .as[Long].collect().toSet
    val maxCnt = Tables.table(spark, sf, "supplier").count() - excluded.size
    val q57 = ExtendedQueries.q57PartSupplierCounts(spark, sf).collect()
    assert(q57.nonEmpty)
    q57.foreach(r =>
      assert(r.getAs[Long]("supplier_cnt") <= maxCnt))
    // q58: each reported supplier holds a strict majority of some
    // matching part's windowed volume (BigDecimal recompute)
    val win = Tables.table(spark, sf, "lineitem")
      .filter(col("l_shipdate") >=
          to_timestamp(lit(ExtendedQueries.Q58WindowStart)) &&
        col("l_shipdate") < to_timestamp(lit(ExtendedQueries.Q58WindowEnd)))
      .join(Tables.table(spark, sf, "part")
        .filter(col("p_name").startsWith(ExtendedQueries.Q58PartPrefix)),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .as[(Long, Long, Double)].collect()
    val byPart = win.groupBy(_._1)
    def qsum(xs: Iterable[Double]) =
      xs.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    val majoritySupps = byPart.values.flatMap { xs =>
      val tot = qsum(xs.map(_._3))
      xs.groupBy(_._2).collect {
        case (sk, ys) if qsum(ys.map(_._3)) * 2 > tot => sk
      }
    }.toSet
    val nation3 = Tables.table(spark, sf, "supplier")
      .join(Tables.table(spark, sf, "nation")
        .filter(col("n_name") === ExtendedQueries.Q58Nation),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name").as[(Long, String)].collect().toMap
    val expect58 = nation3.collect {
      case (sk, name) if majoritySupps.contains(sk) => name
    }.toSeq.sorted
    val q58 = ExtendedQueries.q58MajorityShareSuppliers(spark, sf).collect()
      .map(_.getAs[String]("s_name")).toSeq
    assert(q58 == expect58)
  }

  test("q59-q66: the remaining TPC-H shapes hold their invariants") {
    import graft.operators.ExtendedQueries
    // q59: EXISTS-late counts — every counted order really has a late line
    val q59 = ExtendedQueries.q59LateOrderPriorities(spark, sf).collect()
    assert(q59.nonEmpty)
    val lateOrders = Tables.table(spark, sf, "orders")
      .filter(col("o_orderdate") >=
          to_timestamp(lit(ExtendedQueries.Q59WindowStart)) &&
        col("o_orderdate") < to_timestamp(lit(ExtendedQueries.Q59WindowEnd)))
      .join(Tables.table(spark, sf, "lineitem"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > date_add(col("o_orderdate"),
            ExtendedQueries.LateShipDays))
      .select("o_orderkey").distinct().count()
    assert(q59.map(_.getAs[Long]("order_count")).sum == lateOrders)
    // q62/q66: shares are genuine fractions of the same one-pass total
    val shares = ExtendedQueries.q62MarketShare(spark, sf).collect()
      .map(_.getAs[Double]("mkt_share"))
    assert(shares.nonEmpty && shares.forall(v => v >= 0.0 && v <= 1.0))
    val promo = ExtendedQueries.q66PromoRevenue(spark, sf)
      .head().getAs[Double]("promo_revenue")
    assert(promo >= 0.0 && promo <= 100.0)
    // q65: the two class rows partition the joined line count exactly
    val q65 = ExtendedQueries.q65PriorityShipClass(spark, sf).collect()
    assert(q65.map(_.getAs[String]("ship_class")).toSet ==
      Set("late", "ontime"))
    val totalLines = Tables.table(spark, sf, "lineitem").count()
    assert(q65.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum == totalLines)
    // q61: only the two bilateral direction pairs appear (checked at
    // sf0.01 — the specific nation pair has no traffic in the sf0.001
    // window, which is itself a correct empty result)
    val q61 = ExtendedQueries
      .q61VolumeShipping(spark, "/root/testdata/sf0.01").collect()
    assert(q61.nonEmpty)
    q61.foreach { r =>
      val pair = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))
      assert(pair == (ExtendedQueries.Q61NationA, ExtendedQueries.Q61NationB) ||
        pair == (ExtendedQueries.Q61NationB, ExtendedQueries.Q61NationA))
    }
    // q64: top-20 revenue is sorted and strictly from R-flagged lines
    val q64 = ExtendedQueries.q64ReturnedItems(spark, sf).collect()
    assert(q64.nonEmpty && q64.length <= 20)
    val revs = q64.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("p19 dsir: bucket classes and doc scores match a BigInt mirror") {
    import graft.operators.Sampling
    val got = Sampling.dsirWeighting(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    def md5hex(s0: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(tok: String) =
      java.lang.Long.parseLong(md5hex(tok).take(8), 16) % Sampling.DsirBuckets
    val occ = docs.flatMap { case (id, lang, text) =>
      text.trim.toLowerCase.split("\\s+").toSeq
        .map(tk => (id, lang, bucket(tk))) }
    val r = occ.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val t = occ.filter(_._2 == Sampling.DsirTargetLang)
      .groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val (rTot, tTot) = (occ.size.toLong,
      occ.count(_._2 == Sampling.DsirTargetLang).toLong)
    val K = Sampling.DsirMaxClass
    val B = Sampling.DsirBuckets
    def cls(b: Long): Int =
      (K to (-K + 1) by -1).find { k =>
        BigInt(t.getOrElse(b, 0L) + 1) * BigInt(rTot + B) *
          BigInt(1L << math.max(0, -k)) >=
          BigInt(r(b) + 1) * BigInt(tTot + B) * BigInt(1L << math.max(0, k))
      }.getOrElse(-K)
    docs.foreach { case (id, _, text) =>
      val row = got(id)
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val pts = toks.map(tk => cls(bucket(tk)).toLong).sum
      assert(row.getAs[Long]("n_tokens") == toks.size)
      assert(row.getAs[Long]("dsir_points") == pts, s"doc $id points")
      assert(row.getAs[Int]("keep") == (if (pts > 0) 1 else 0))
    }
    // the signal points the right way: target-language docs score higher
    // per token on average than the rest of the corpus
    val (en, rest) = got.values.partition(
      _.getAs[String]("lang") == Sampling.DsirTargetLang)
    def avg(rs: Iterable[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("mean_class")).sum / rs.size
    assert(en.nonEmpty && rest.nonEmpty && avg(en) > avg(rest))
  }

  test("t19 cms: estimates never undercount and match a sketch mirror") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.cmsHeavyHitters(spark, sf).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.nonEmpty && rows.length <= TextAnalysis.VocabTopK)
    def md5hex(s0: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(i: Int, tok: String) =
      java.lang.Long.parseLong(md5hex(s"$i:$tok").take(8), 16) %
        TextAnalysis.CmsWidth
    val toks = Tables.table(spark, sf, "documents")
      .select("text").as[String].collect()
      .flatMap(_.trim.toLowerCase.split("\\s+"))
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val sketch = (for { t <- toks; i <- 0 until TextAnalysis.CmsDepth }
      yield (i, bucket(i, t))).groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    rows.foreach { r =>
      val t = r.getAs[String]("token")
      assert(r.getAs[Long]("freq") == exact(t))
      val est = (0 until TextAnalysis.CmsDepth)
        .map(i => sketch((i, bucket(i, t)))).min
      assert(r.getAs[Long]("cms_est") == est, s"token '$t' estimate")
      assert(r.getAs[Long]("overestimate") == est - exact(t))
      assert(r.getAs[Long]("overestimate") >= 0, "CMS never undercounts")
    }
    // the heavy-hitter list is the exact top-k by (freq desc, token asc)
    val expectedTop = exact.toSeq.sortBy { case (t, f) => (-f, t) }
      .take(TextAnalysis.VocabTopK).map(_._1)
    assert(rows.map(_.getAs[String]("token")).toSeq == expectedTop)
  }

  test("d19 agreement audit is consistent with d05 and d18") {
    val r = Dedup.dedupMethodAgreement(spark, sf).head()
    val nLsh = r.getAs[Long]("n_lsh")
    val nSem = r.getAs[Long]("n_sem")
    val nBoth = r.getAs[Long]("n_both")
    // the LSH side IS d05's verified pair table
    assert(nLsh == Dedup.embeddingCosine(spark, sf).count())
    // identities of the rollup
    assert(r.getAs[Long]("n_lsh_only") == nLsh - nBoth)
    assert(r.getAs[Long]("n_sem_only") == nSem - nBoth)
    assert(nBoth <= math.min(nLsh, nSem))
    val union = nLsh + nSem - nBoth
    if (union > 0)
      assert(r.getAs[Double]("jaccard_overlap") == nBoth.toDouble / union)
    // the sem side drives d18's drops: >=1 pair per dropped vector, and
    // zero pairs exactly when nothing was dropped
    val dropped = Dedup.semanticDedup(spark, sf)
      .filter(col("keep") === 0).count()
    assert(nSem >= dropped)
    assert((nSem == 0) == (dropped == 0))
  }

  test("t18 bigram xent: quantized classes match an integer mirror") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.bigramXent(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val bgs = docs.map { case (id, t) =>
      val tk = t.trim.toLowerCase.split("\\s+").toSeq
      id -> tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val c2 = bgs.flatMap(_._2).groupBy(identity)
      .map { case (g, xs) => g -> xs.size.toLong }
    val c1 = c2.groupBy(_._1.split(" ", 2)(0))
      .map { case (w, m) => w -> m.values.sum }
    def cls(g: String): Int = {
      val (cc2, cc1) = (c2(g), c1(g.split(" ", 2)(0)))
      (0 until TextAnalysis.XentMaxClass)
        .find(k => cc2 * (1L << k) >= cc1)
        .getOrElse(TextAnalysis.XentMaxClass)
    }
    assert(bgs.exists(_._2.nonEmpty))
    bgs.foreach { case (id, gs) =>
      if (gs.isEmpty) assert(!got.contains(id))
      else {
        val r = got(id)
        val xsum = gs.map(g => cls(g).toLong).sum
        assert(r.getAs[Long]("n_transitions") == gs.size)
        assert(r.getAs[Long]("xent_sum") == xsum, s"doc $id xent_sum")
        assert(r.getAs[Long]("n_tail") ==
          gs.count(g => cls(g) == TextAnalysis.XentMaxClass))
        assert(r.getAs[Double]("mean_xent") == xsum.toDouble / gs.size)
      }
    }
  }

  test("d18 semantic dedup: argmax assignment + greedy keep match a mirror") {
    val got = Dedup.semanticDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cid"), r.getAs[Int]("keep")))).toMap
    val embs = Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    // the engine's exact-decimal contract: per-element DECIMAL(12,6)
    // casts (HALF_UP, as Spark's Cast), exact products and sum, doubles
    // only at the cosine boundary
    def d6(x: Float) =
      BigDecimal(x.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def dot(a: Array[Float], b: Array[Float]): BigDecimal =
      a.zip(b).map { case (x, y) => d6(x) * d6(y) }.sum
    val vecs = embs.toMap
    val nrm = embs.map { case (id, v) =>
      id -> math.sqrt(dot(v, v).toDouble) }.toMap
    // the adaptive stride: ⌊√N⌋ over the whole frame (no query set)
    val semStride =
      graft.operators.Similarity.adaptiveStride(embs.length.toLong)
    val cents = embs.filter(_._1 % semStride == 0)
    assert(cents.nonEmpty)
    val assign = embs.map { case (id, v) =>
      id -> cents.map { case (cid, cv) =>
        (dot(v, cv).toDouble / (nrm(id) * nrm(cid)), cid)
      }.minBy { case (c, cid) => (-c, cid) }._2
    }.toMap
    val byCluster = assign.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted)
    val dropped = byCluster.values.flatMap { ids =>
      for {
        i <- ids.indices; j <- i + 1 until ids.size
        if dot(vecs(ids(i)), vecs(ids(j))).toDouble /
          (nrm(ids(i)) * nrm(ids(j))) > Dedup.CosineThreshold
      } yield ids(j)
    }.toSet
    assert(got.size == embs.length)
    embs.foreach { case (id, _) =>
      val (cid, keep) = got(id)
      assert(cid == assign(id), s"vec $id assigned to wrong centroid")
      assert(keep == (if (dropped(id)) 0 else 1), s"vec $id keep flag")
    }
    // the lowest-id member of every cluster is always kept
    byCluster.values.foreach(ids => assert(got(ids.head)._2 == 1))
  }

  test("q46: aggregated quantifier rewrite equals the literal EXISTS form") {
    import graft.operators.ExtendedQueries
    // all-nations binding so the tiny corpus yields rows; plain-Scala
    // mirror runs the LITERAL double-correlated quantifiers. Lateness is
    // the engine's pinned semantic: ship TIMESTAMP strictly after
    // midnight of date(o_orderdate) + LateShipDays (date_add truncates).
    val got = ExtendedQueries.q46WaitingSuppliers(spark, sf, None).collect()
      .map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait")))
    assert(got.nonEmpty)
    val orders = Tables.table(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .map { case (k, d) => k -> d.toLocalDateTime }.toMap
    val lo = Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(r => orders.contains(r._1))
      .map { case (ok, sk, ship) =>
        (ok, sk, ship.toLocalDateTime.isAfter(
          orders(ok).toLocalDate
            .plusDays(ExtendedQueries.LateShipDays).atStartOfDay))
      }
    val supName = Tables.table(spark, sf, "supplier")
      .select("s_suppkey", "s_name").as[(Long, String)].collect().toMap
    val byOrder = lo.groupBy(_._1)
    val waits = for {
      (ok, sk, late) <- lo if late
      others = byOrder(ok).filter(_._2 != sk)
      if others.nonEmpty           // EXISTS a different supplier
      if !others.exists(_._3)      // NOT EXISTS a different LATE supplier
    } yield supName(sk)
    val expected = waits.groupBy(identity)
      .map { case (n, xs) => (n, xs.size.toLong) }
      .toSeq.sortBy { case (n, w) => (-w, n) }.take(20)
    assert(got.toSeq == expected)
  }

  test("q47: scalar-average cross-multiplication and anti join are exact") {
    import graft.operators.ExtendedQueries
    val got = ExtendedQueries.q47DormantHighBalance(spark, sf).collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("numcust"),
        r.getAs[Double]("totacctbal")))
    assert(got.nonEmpty)
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val cust = Tables.table(spark, sf, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .as[(Long, Long, Double)].collect()
    val pos = cust.filter(_._3 > 0)
    val (posSum, posN) = (pos.map(c => d2(c._3)).sum, pos.size)
    val cutoff = java.time.LocalDate.parse(ExtendedQueries.DormantCutoff)
    val activeCust = Tables.table(spark, sf, "orders")
      .select("o_custkey", "o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .filter(!_._2.toLocalDateTime.toLocalDate.isBefore(cutoff))
      .map(_._1).toSet
    val nation = Tables.table(spark, sf, "nation")
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val kept = cust.filter(c =>
      d2(c._3) * posN > posSum && !activeCust.contains(c._1))
    val expected = kept.groupBy(c => nation(c._2))
      .map { case (n, cs) =>
        (n, cs.size.toLong, cs.map(c => d2(c._3)).sum.toDouble) }
      .toSeq.sortBy(_._1)
    // operator returns an unsorted distributed frame (r16) — sort here
    assert(got.toSeq.sortBy(_._1) == expected)
  }

  test("q48: HAVING threshold, decimal quantity sums, price-ranked top-20") {
    import graft.operators.ExtendedQueries
    val got = ExtendedQueries.q48LargeVolumeCustomers(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 20)
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val sumQty = Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity").as[(Long, Double)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(r => d2(r._2)).sum }
    // every returned order is over-threshold with the exact decimal sum
    got.foreach { r =>
      val ok = r.getAs[Long]("o_orderkey")
      assert(sumQty(ok) > ExtendedQueries.LargeVolumeQty)
      assert(r.getAs[Double]("sum_qty") == sumQty(ok).toDouble)
    }
    // and they are THE top-20 by (price desc, key asc) among qualifiers
    val prices = got.map(r => (r.getAs[Double]("o_totalprice"),
      r.getAs[Long]("o_orderkey")))
    val ordered = prices.sortBy { case (p, k) => (-p, k) }.toSeq
    assert(prices.toSeq == ordered)
    val qualifying = sumQty.filter(_._2 > ExtendedQueries.LargeVolumeQty).keySet
    assert(got.map(_.getAs[Long]("o_orderkey")).toSet.subsetOf(qualifying))
    assert(got.length == math.min(20, qualifying.size))
  }

  test("s15 under ADC ties: rank() is ties-inclusive and the full " +
      "presentation key (qid, rank, neighbor_id) stays unique") {
    import graft.operators.Similarity
    // corpus where ids 10..49 all carry query 8's embedding: identical
    // vectors get identical PQ codes under any codebook, so query 8
    // sees 40 candidates tied at the maximal pq_score — the tie class
    // the exact-duplicate guarantee cuts ties-inclusively on. Ids run
    // to 199 so the stride-sampled coarse quantizer has several
    // centroids (adaptive stride ⌊√190⌋ = 13 → cids 13, 26, …); the
    // duplicates all share cid 13 (their ccos there is exactly 1), and
    // query 8 probes that list first, so the tie class is retrieved
    // whole at any stride.
    val base = (i: Long) => Seq.tabulate(Similarity.Dim)(d =>
      (((i * 31 + d * 7) % 13) - 6).toFloat)
    val rows = (0L until 200L).map { i =>
      val v = if (i >= 10 && i < 50) base(8) else base(i)
      (i, v)
    }
    val e = Similarity.withNorm(
      spark.createDataFrame(rows).toDF("vec_id", "embedding"))
    val out = Similarity.ivfPqRanked(e).collect()
    // ties-inclusive: at least one query keeps more than topK=3 rows
    val perQ = out.groupBy(_.getAs[Long]("qid")).view.mapValues(_.length)
    assert(perQ.values.exists(_ > 3),
      "fixture must produce a tie crossing the top-3 boundary")
    // and the full presentation key is a total order: no two rows share
    // (qid, rank, neighbor_id) — the property the s15/s18b canon and
    // oracle ORDER BY rely on for deterministic hashing
    val keys = out.map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id")))
    assert(keys.distinct.length == keys.length)
    // tied rows share the rank value (rank(), not row_number())
    val tied = out.groupBy(r => (r.getAs[Long]("qid"),
      r.getAs[Double]("pq_score"))).values.filter(_.length > 1)
    assert(tied.nonEmpty && tied.forall(g =>
      g.map(_.getAs[Int]("rank")).distinct.length == 1))
  }

  test("s22: label purity equals a plain-Scala mirror over the exact " +
      "top-K truth; counts close over the query sample") {
    import graft.operators.Similarity
    val got = Similarity.labelPurity(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> (r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("n_correct"))).toMap
    // every query accounted for, hits bounded by TopK per query
    assert(got.values.map(_._1).sum == Similarity.NumQueries)
    got.values.foreach { case (n, hits, correct) =>
      assert(hits <= n * Similarity.TopK && correct <= n)
    }
    // mirror: exact top-K from the engine's own brute-force truth
    // (s01's spec-verified contract), labels joined driver-side
    val lab = Tables.table(spark, sf, "embeddings")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val top = Similarity.bruteForceTopK(spark, sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1)
    val perLabel = top.toSeq.map { case (qid, rows) =>
      val ql = lab(qid)
      val ns = rows.map(r => lab(r._2))
      val maj = ns.groupBy(identity).toSeq
        .map { case (l, xs) => (l, xs.size) }
        .minBy { case (l, c) => (-c, l) }._1
      (ql, ns.count(_ == ql).toLong, if (maj == ql) 1L else 0L)
    }.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
    }
    assert(got == perLabel)
  }

  test("q44b clustered series top-k: single-cluster degenerate case is " +
      "the unbanded exact search — dominates q44's banded answers") {
    import graft.operators.ExtendedQueries
    // explicit stride 50: at sf0.001 exactly one user survives it → ONE
    // cluster → q44b's candidate set is ALL directed pairs, a superset
    // of q44's same-peak-hour pairs (the adaptive default would split
    // the corpus into √N clusters — correct, but not this degenerate
    // case; the oracle covers the default end-to-end)
    val b = ExtendedQueries.q44bSeriesTopKClustered(spark, sf, stride = 50)
      .select("qid", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect()
    val a = ExtendedQueries.q44SeriesTopK(spark, sf)
      .select("qid", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(b.nonEmpty && a.nonEmpty)
    assert(b.forall { case (_, r, _, c) => r >= 1 && r <= 3 &&
      c <= 1.0 + 1e-9 && c >= -1.0 - 1e-9 })
    // every banded qid is served by the clustered search too
    val bTop = b.filter(_._2 == 1).map(x => x._1 -> x._4).toMap
    val aTop = a.filter(_._2 == 1).map(x => x._1 -> x._4).toMap
    assert(aTop.keySet.subsetOf(bTop.keySet))
    // superset candidates ⇒ the clustered best is at least the banded
    // best for every shared user (the degenerate-exactness property)
    aTop.foreach { case (qid, c) =>
      assert(bTop(qid) >= c - 1e-12, s"qid $qid: ${bTop(qid)} < $c")
    }
  }
}
