package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.BoundedTopK.bounded_top_k

/** The bounded top-k aggregate must be a drop-in for the
  * `row_number().over(...) <= k` window form — same survivors, same
  * order, same ties — while executing as an ObjectHashAggregate with
  * map-side partials (the spill-lean shape q44's exact tail needs). */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("matches sort-take semantics on skewed groups incl. ties and singletons") {
    // deterministic pseudo-random rows; group 0 is hot, group 9 is a
    // singleton; duplicated scores exercise the tie path
    val rows = (0 until 500).map { i =>
      val g = if (i % 3 == 0) 0L else (i % 10).toLong
      val score = ((i * 37) % 25).toDouble / 8.0
      (g, score, i.toLong)
    }
    val df = rows.toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(bounded_top_k(struct((-col("score")).as("ns"), col("id")), 3).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("t.id").as("id"), (-col("t.ns")).as("score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = rows.groupBy(_._1).flatMap { case (g, gs) =>
      gs.sortBy(x => (-x._2, x._3)).take(3).zipWithIndex.map {
        case ((_, s, id), i) => (g, i + 1, id, s)
      }
    }.toSet
    assert(got == want)
  }

  test("survives shuffle serde: distributed run equals single-partition run") {
    val df = (0 until 2000).map(i =>
      ((i % 7).toLong, ((i * 131) % 997).toDouble, i.toLong))
      .toDF("g", "score", "id")
    def run(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(bounded_top_k(struct(col("score"), col("id")), 5).as("tk"))
      .select(col("g"), col("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toList).toMap
    assert(run(df.repartition(16)) == run(df.coalesce(1)))
  }

  test("q44 exact tail: bounded aggregate equals the window form on real data") {
    val got = graft.operators.ExtendedQueries.q44SeriesTopK(spark, sf)
    // the window form the aggregate replaced, over the same scored frame
    // is covered by the DuckDB oracle at sf0.01; here assert the plan
    // and the per-qid invariants the window guaranteed
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "bounded_top_k must run as ObjectHashAggregate (partial per map task)")
    assert(!plan.contains("RunningWindowFunction") ||
      !plan.contains("row_number"), "window form crept back")
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to rs.length), s"qid $qid ranks $ranks")
      assert(rs.length <= 3, s"qid $qid emitted ${rs.length} rows")
      // descending cos, neighbor-id tie-break ascending
      val ordered = rs.sortBy(_.getInt(1))
        .map(r => (r.getDouble(3), r.getLong(2)))
      assert(ordered.sameElements(ordered.sortBy(x => (-x._1, x._2))),
        s"qid $qid order $ordered")
    }
  }
}
