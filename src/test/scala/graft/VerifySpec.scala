package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A broken query must never be able to DISAPPEAR from the correctness
  * scoreboard (r7: 8 throwing queries left only stderr lines, and the
  * driver's CORRECTNESS silently dropped them). Verify.run now leaves
  * per-query `_ERROR` markers plus an aggregate `verify_errors.json`. */
class VerifySpec extends SparkSpec {

  private def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ok_query" -> ((s, _) => s.range(3).toDF("id")),
    "broken_query" -> ((_, _) =>
      throw new IllegalStateException("deliberate spec failure")))

  test("a thrown query leaves an _ERROR marker and lands in verify_errors.json") {
    val out = Files.createTempDirectory("verify-spec").toString
    val errors = Verify.run(spark, "/unused", out, queries)

    assert(errors.keySet == Set("broken_query"))
    assert(errors("broken_query").contains("deliberate spec failure"))

    val marker = Paths.get(s"$out/broken_query._ERROR")
    assert(Files.exists(marker), "per-query _ERROR marker missing")
    assert(Files.readString(marker).contains("deliberate spec failure"))

    val agg = Files.readString(Paths.get(s"$out/verify_errors.json"))
    assert(agg.contains("\"broken_query\"") &&
      agg.contains("deliberate spec failure"))

    // the healthy query still wrote its parquet alongside the failure
    assert(spark.read.parquet(s"$out/ok_query").count() == 3)
    assert(!Files.exists(Paths.get(s"$out/ok_query._ERROR")))
  }

  test("a clean run writes an empty verify_errors.json (always present)") {
    val out = Files.createTempDirectory("verify-spec-clean").toString
    val errors = Verify.run(spark, "/unused", out,
      queries.filter(_._1 == "ok_query"))
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(s"$out/verify_errors.json")).trim == "{}")
  }

  test("the name filter limits execution to the selected queries") {
    val out = Files.createTempDirectory("verify-spec-only").toString
    val errors = Verify.run(spark, "/unused", out, queries,
      only = Some(Set("ok_query")))
    assert(errors.isEmpty, "filtered-out broken query must not run")
    assert(Files.exists(Paths.get(s"$out/ok_query")))
    assert(!Files.exists(Paths.get(s"$out/broken_query._ERROR")))
  }
}
