package graft

import graft.operators.TextAnalysis

/** PII matching + redaction on a corpus that actually contains PII (the
  * driver's synthetic documents are digit-free, so t09's oracle check
  * exercises plumbing only). */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("counts and redacts emails, IPs, and phone numbers") {
    val docs = Seq(
      (1L, "Contact Alice.Smith+spam@Example-Mail.org or bob@sub.domain.io today"),
      (2L, "server at 10.0.255.3, fallback 192.168.1.1; call 555-123-4567"),
      (3L, "no pii here, just words"),
      (4L, "x@y.zz 1.2.3.4 999-000-1111 x@y.zz")
    ).toDF("doc_id", "text")

    val out = TextAnalysis.piiScanOf(docs)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(5)))

    assert(out(0) == ((1L, 2L, 0L, 0L, true)))
    assert(out(1) == ((2L, 0L, 2L, 1L, true)))
    assert(out(2) == ((3L, 0L, 0L, 0L, false)))
    assert(out(3) == ((4L, 2L, 1L, 1L, true)))
  }

  test("redacted length reflects replacement, and order is email->ip->phone") {
    val docs = Seq((1L, "a@b.cc and 1.2.3.4")).toDF("doc_id", "text")
    val row = TextAnalysis.piiScanOf(docs).collect().head
    // "a@b.cc and 1.2.3.4" (18 chars) -> "<EMAIL> and <IP>" (16 chars)
    assert(row.getAs[Int]("redacted_len") == 16)
  }
}
