package graft

import graft.operators.Sampling

/** Structural invariants of the sequence-packing and token-budget
  * operators on the real corpus — properties the oracle hash can't
  * express directly (it proves equality, not meaning). */
class PackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("packing spans are contiguous, in-bounds, and token-preserving") {
    val rows = Sampling.sequencePacking(spark, dir).collect()
    assert(rows.nonEmpty)
    val L = Sampling.ContextLen
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_.getAs[Long]("doc_id"))
      var expectedStartTokens = 0L
      sorted.foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        val start = r.getAs[Long]("start_bin")
        val end = r.getAs[Long]("end_bin")
        val off = r.getAs[Long]("offset_in_bin")
        // offset sits inside the first window; spans never run backwards
        assert(off >= 0 && off < L)
        assert(end >= start)
        // the doc begins exactly where the previous doc's tokens ended
        assert(expectedStartTokens == start * L + off)
        // end_bin is the window holding the doc's LAST token
        assert(end == (expectedStartTokens + n - 1) / L)
        expectedStartTokens += n
      }
    }
  }

  test("token budget cuts each language at the boundary document") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextPrep
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val langDocs = docs
      .groupBy("lang").agg(count(lit(1)).as("all_docs"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("all_docs"))
      .toMap
    // the overshoot is at most the boundary document's own token count —
    // bound it by the corpus max, not a fixed constant (testdata is
    // regenerated per round, so document lengths are not stable)
    val maxDocTokens = docs
      .agg(max(size(TextPrep.tokens(col("text")))).cast("long")).head.getLong(0)
    val rows = Sampling.tokenBudgetSample(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val total = r.getAs[Long]("n_tokens_total")
      val nDocs = r.getAs[Long]("n_docs")
      assert(nDocs > 0)
      // the cut rule keeps every doc that STARTS under budget, so either
      // the realized total reached the budget (last kept doc crossed it)
      // or the language ran out of documents entirely
      assert(total >= Sampling.TokenBudget || nDocs == langDocs(lang),
        s"$lang stopped at $total tokens / $nDocs docs without reaching " +
          s"the ${Sampling.TokenBudget} budget or exhausting the corpus")
      assert(total < Sampling.TokenBudget + maxDocTokens,
        s"total $total exceeds budget by more than one document " +
          s"(max doc = $maxDocTokens tokens)")
    }
  }

  test("sliding chunks tile every document: full windows, stride advance, exact tail") {
    val W = Sampling.ChunkLen
    val S = Sampling.ChunkStride
    val byDoc = Sampling.slidingChunks(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ==
        (0L until sorted.length.toLong))
      val n = sorted.last.getAs[Long]("tok_end")
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("tok_start") == i.toLong * S)
        val len = r.getAs[Long]("chunk_len")
        assert(r.getAs[Long]("tok_end") == r.getAs[Long]("tok_start") + len)
        // every window but the last is full; the tail keeps >= W-S+1
        // tokens (else its content was already covered by the previous
        // window and the chunk should not exist)
        if (i < sorted.length - 1) assert(len == W,
          s"doc $id chunk $i not full: $len")
        else if (sorted.length > 1) assert(len >= W - S + 1 && len <= W)
      }
      // coverage: the last window ends exactly at the token count, and
      // consecutive windows overlap by W-S (no token skipped)
      assert(sorted.length == (math.max(n - W, 0) + S - 1) / S + 1)
    }
  }

  test("sliding chunks split long documents at exact stride boundaries") {
    // the driver corpus never exceeds ChunkLen tokens, so multi-chunk
    // geometry must be driven synthetically: known token counts spanning
    // 1 token → several windows, including the exact-fit boundaries
    import spark.implicits._
    val W = Sampling.ChunkLen
    val S = Sampling.ChunkStride
    val counts = Seq(1, W - 1, W, W + 1, W + S, W + S + 1, 4 * W)
    val docs = counts.zipWithIndex
      .map { case (n, id) => (id.toLong, Seq.fill(n)("tok").mkString(" ")) }
      .toDF("doc_id", "text")
    val byDoc = Sampling.slidingChunksOf(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    counts.zipWithIndex.foreach { case (n, id) =>
      val chunks = byDoc(id.toLong).sortBy(_.getAs[Long]("chunk_id"))
      assert(chunks.length == (math.max(n - W, 0) + S - 1) / S + 1,
        s"$n tokens -> wrong chunk count ${chunks.length}")
      // tokens [0,n) are covered with no gap: window i spans
      // [i*S, min(i*S+W, n)) and the next window starts W-S short of its end
      chunks.foreach { c =>
        val i = c.getAs[Long]("chunk_id")
        assert(c.getAs[Long]("tok_start") == i * S)
        assert(c.getAs[Long]("tok_end") == math.min(i * S + W, n))
      }
      assert(chunks.last.getAs[Long]("tok_end") == n)
    }
    // boundary sanity: W and W+1 tokens differ by exactly one window
    assert(byDoc(2L).length == 1 && byDoc(3L).length == 2)
    // token conservation: chunk lengths minus the repeated overlaps
    // reconstruct the doc's token count exactly
    val ov = W - S
    counts.zipWithIndex.foreach { case (n, id) =>
      val chunks = byDoc(id.toLong)
      assert(chunks.map(_.getAs[Long]("chunk_len")).sum -
        ov.toLong * (chunks.length - 1) == n.toLong,
        s"$n tokens not conserved through overlapping chunks")
    }
  }
}
