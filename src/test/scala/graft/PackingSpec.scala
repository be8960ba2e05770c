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
}
