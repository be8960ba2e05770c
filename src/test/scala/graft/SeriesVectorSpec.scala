package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType,
  StructField, StructType}

import graft.functions.DecimalSeriesDot.decimal_series_dot

/** The q44-family vector rewrite (24-slot hourly profile arrays scored by
  * [[graft.functions.DecimalSeriesDot]], r14) against the relational
  * hour-join form it replaced. The DuckDB oracle still computes the
  * relational form, so the answer sets must be BIT-IDENTICAL — same
  * pairs, same ranks, same cos_sim doubles — not merely close. */
class SeriesVectorSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("decimal_series_dot: slot presence semantics — null slots skipped, " +
      "no common slot yields NULL, zero-valued slots still count") {
    val df = spark.sql(
      """SELECT
        |  array(CAST(1.5 AS DECIMAL(18,6)), NULL,
        |        CAST(-2.25 AS DECIMAL(18,6))) AS overlap_a,
        |  array(CAST(2 AS DECIMAL(18,6)), CAST(9 AS DECIMAL(18,6)),
        |        CAST(4 AS DECIMAL(18,6))) AS overlap_b,
        |  array(NULL, CAST(7 AS DECIMAL(18,6))) AS disjoint_a,
        |  array(CAST(3 AS DECIMAL(18,6)), NULL) AS disjoint_b,
        |  array(CAST(0 AS DECIMAL(18,6))) AS zero_a,
        |  array(CAST(5 AS DECIMAL(18,6))) AS zero_b""".stripMargin)
    val r = df.select(
      decimal_series_dot(col("overlap_a"), col("overlap_b")).as("d1"),
      decimal_series_dot(col("disjoint_a"), col("disjoint_b")).as("d2"),
      decimal_series_dot(col("zero_a"), col("zero_b")).as("d3"),
      // length mismatch: slots past the shorter end are absent
      decimal_series_dot(col("disjoint_b"), col("zero_b")).as("d4")).head()
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("-6")) == 0,
      s"1.5*2 + (-2.25*4) = -6, got ${r.getDecimal(0)}")
    assert(r.isNullAt(1), "no common present slot must be NULL, not 0")
    assert(r.getDecimal(2).compareTo(java.math.BigDecimal.ZERO) == 0,
      "a present-but-zero slot still scores (as 0), it is not absence")
    assert(r.getDecimal(3).compareTo(new java.math.BigDecimal("15")) == 0,
      s"3*5 over the 1 shared slot, got ${r.getDecimal(3)}")
  }

  test("decimal_series_dot equals a driver-side BigDecimal fold on random " +
      "slotted vectors (exactness, both eval paths)") {
    val rnd = new scala.util.Random(42)
    def slot(): java.math.BigDecimal =
      if (rnd.nextInt(3) == 0) null
      else new java.math.BigDecimal(rnd.nextInt(2000001) - 1000000)
        .movePointLeft(6)
    val rows = (0 until 200).map { i =>
      (i, Array.fill(24)(slot()).toSeq, Array.fill(24)(slot()).toSeq)
    }
    val schema = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.IntegerType),
      StructField("a", ArrayType(DecimalType(18, 6), containsNull = true)),
      StructField("b", ArrayType(DecimalType(18, 6), containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, a, b) => Row(i, a, b) }, 4),
      schema)
    val got = df.select(col("id"),
        decimal_series_dot(col("a"), col("b")).as("d"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDecimal(1)))
      .toMap
    rows.foreach { case (i, a, b) =>
      val terms = a.zip(b).collect {
        case (x, y) if x != null && y != null => x.multiply(y)
      }
      val want = if (terms.isEmpty) null else terms.reduce(_.add(_))
      val g = got(i)
      if (want == null) assert(g == null, s"row $i: expected NULL, got $g")
      else assert(g != null && g.compareTo(want) == 0,
        s"row $i: expected $want, got $g")
    }
  }

  test("r16 fast paths are bit-identical to the BigDecimal reference " +
      "loops: random, tie-zone, range-capped, and overflow inputs") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    // --- decimal_vec_dot (float inputs, HALF_UP scale-6 elements) ---
    val rnd = new scala.util.Random(7)
    def arr(xs: Array[Float]) = ArrayData.toArrayData(xs)
    def refEquals(a: Array[Float], b: Array[Float]): Unit = {
      val got = graft.functions.DecimalVecDot.dot(arr(a), arr(b))
      val want = graft.functions.DecimalVecDot.slowDot(arr(a), arr(b), a.length)
      assert(got.toJavaBigDecimal.compareTo(want.toJavaBigDecimal) == 0 &&
        got.toJavaBigDecimal.scale == want.toJavaBigDecimal.scale,
        s"fast $got != reference $want")
    }
    (0 until 50).foreach { _ =>
      val a = Array.fill(64)(rnd.nextFloat() * 20 - 10)
      val b = Array.fill(64)(rnd.nextFloat() * 20 - 10)
      refEquals(a, b)
    }
    // exact HALF_UP ties: 0.0078125f = 2^-7 is exactly x.xxxxxx5 at
    // scale 7, so the element derivation must round UP on both paths
    // (the fast path must detect the tie zone and defer)
    refEquals(Array.fill(8)(0.0078125f), Array.fill(8)(1.0f))
    refEquals(Array.fill(8)(-0.0078125f), Array.fill(8)(1.0f))
    refEquals(Array(0.0000005f, -0.0000005f, 1.5e-6f), Array(1f, 1f, 1f))
    // magnitudes past the fast-path range cap fall back whole-call
    refEquals(Array(3.5e9f, 1.0f), Array(2.0f, 2.0f))
    // a sum that overflows the long accumulator falls back whole-call
    refEquals(Array.fill(64)(1.9e3f), Array.fill(64)(1.9e3f))
    refEquals(Array.fill(4)(0.0f), Array.fill(4)(0.0f))

    // --- decimal_series_dot (compact-decimal slots) ---
    def dec(s: String) = new java.math.BigDecimal(s)
    def darr(xs: Array[java.math.BigDecimal]) = {
      val ds = xs.map(x => if (x == null) null
        else org.apache.spark.sql.types.Decimal(x, 18, 6))
      ArrayData.toArrayData(ds)
    }
    def seriesRefEquals(a: Array[java.math.BigDecimal],
        b: Array[java.math.BigDecimal]): Unit = {
      val got = graft.functions.DecimalSeriesDot.dot(darr(a), darr(b), 18, 6)
      val want = graft.functions.DecimalSeriesDot.slowDot(darr(a), darr(b),
        18, 6, math.min(a.length, b.length))
      if (want == null) assert(got == null)
      else assert(got != null &&
        got.toJavaBigDecimal.compareTo(want.toJavaBigDecimal) == 0,
        s"series fast $got != reference $want")
    }
    // unscaled ~1e12 each: products ~1e24 overflow multiplyExact and
    // must fall back to the BigDecimal loop with the identical value
    seriesRefEquals(Array(dec("999999.999999"), dec("888888.888888")),
      Array(dec("999999.999999"), dec("777777.777777")))
    seriesRefEquals(Array(dec("1.5"), null, dec("-2.25")),
      Array(dec("2"), dec("9"), dec("4")))
    seriesRefEquals(Array[java.math.BigDecimal](null), Array(dec("3")))
  }

  test("decimal_series_dot past the exactness envelope fails with the " +
      "targeted overflow message, not a bare Decimal ctor error") {
    // 120 worst-case DECIMAL(18,6) slots: each product is 10^24-ish at
    // 36 digits; 120 of them need 39 digits > DECIMAL(38)
    val big = "999999999999.999999"
    val df = spark.sql(
      s"""SELECT array(${Seq.fill(120)(s"CAST($big AS DECIMAL(18,6))")
        .mkString(",")}) AS v""")
    // constant folding may evaluate on the driver (bare
    // ArithmeticException) or at runtime (wrapped in SparkException) —
    // either way the targeted message must be in the cause chain
    val ex = intercept[Throwable] {
      df.select(decimal_series_dot(col("v"), col("v")).as("d")).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(m => m.contains("decimal_series_dot") &&
      m.contains("headroom")),
      s"expected the targeted envelope message, got: $msgs")
  }

  // --- the relational reference the vector form replaced (the oracle's
  // exact shape: hour join + sum, row_number window) ---

  private def profiles(): (DataFrame, DataFrame) = {
    val d18 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 6))
    val prof = Tables.events(spark, sf)
      .select(col("user_id"),
        (expr("ts_us div 3600000000") % 24).as("hour"), col("value"))
      .filter(col("value").isNotNull)
      .groupBy("user_id", "hour")
      .agg(d18(sum(col("value").cast(DecimalType(12, 6)))).as("v"))
    val n2 = prof.groupBy("user_id")
      .agg(sum(col("v") * col("v")).as("n2"))
    (prof, n2)
  }

  private def refTail(cand: DataFrame, prof: DataFrame,
      n2: DataFrame): DataFrame = {
    val pa = prof.select(col("user_id").as("qa"), col("hour"),
      col("v").as("va"))
    val pb = prof.select(col("user_id").as("qb"), col("hour"),
      col("v").as("vb"))
    val dots = cand.join(pa, "qa").join(pb, Seq("qb", "hour"))
      .groupBy("qa", "qb")
      .agg(sum(col("va") * col("vb")).as("dot"))
    val scored = dots
      .join(n2.select(col("user_id").as("qa"), col("n2").as("na")), "qa")
      .join(n2.select(col("user_id").as("qb"), col("n2").as("nb")), "qb")
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("qa").as("qid"), col("qb").as("neighbor_id"),
        (col("dot").cast(DoubleType) /
          (sqrt(col("na").cast(DoubleType)) *
            sqrt(col("nb").cast(DoubleType)))).as("cos_sim"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)).cast("int"))
      .filter(col("rank") <= 3)
      .select("qid", "rank", "neighbor_id", "cos_sim")
  }

  private def asSet(df: DataFrame): Set[(Long, Int, Long, Double)] = {
    import spark.implicits._
    df.select(col("qid"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .as[(Long, Int, Long, Double)].collect().toSet
  }

  // The reference peak replays the ORACLE's tie-break contract: DuckDB's
  // ORDER BY defaults NULLS LAST, so a null-hour row tying the max value
  // must LOSE to any non-null hour — hence asc_nulls_last, same as
  // production q44SeriesTopK (plain .asc would put NULL first and encode
  // the pre-fix semantics the r14 fix removed).
  private def peakOf(prof: DataFrame): DataFrame = prof
    .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
      .orderBy(col("v").desc, col("hour").asc_nulls_last)))
    .filter(col("rn") === 1)
    .select(col("user_id"), col("hour").as("peak_hour"))

  test("peak tie-break on a null-hour max tie follows NULLS LAST " +
      "(the oracle's contract)") {
    // user 1: v=5.0 at hour NULL ties v=5.0 at hour 2 — NULLS LAST must
    // pick hour 2; plain asc (NULLS FIRST) would pick NULL
    val prof = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, CAST(NULL AS INT), CAST(5.0 AS DECIMAL(18,6))),
        |  (1L, 2,                 CAST(5.0 AS DECIMAL(18,6))),
        |  (1L, 7,                 CAST(1.0 AS DECIMAL(18,6)))
        |AS t(user_id, hour, v)""".stripMargin)
    val got = peakOf(prof).collect()
    assert(got.length == 1 && !got(0).isNullAt(1) && got(0).getInt(1) == 2,
      s"expected peak_hour 2 (NULLS LAST), got ${got.toSeq}")
  }

  test("q44 vector form is bit-identical to the relational hour-join form") {
    val (prof, n2) = profiles()
    val peak = peakOf(prof)
    val cand = peak.as("a").join(peak.as("b"),
        col("a.peak_hour") === col("b.peak_hour") &&
          col("a.user_id") =!= col("b.user_id"))
      .select(col("a.user_id").as("qa"), col("b.user_id").as("qb"))
    val want = asSet(refTail(cand, prof, n2))
    val got = asSet(graft.operators.ExtendedQueries.q44SeriesTopK(spark, sf))
    assert(got.nonEmpty && got == want,
      s"diff: engine-only ${got.diff(want).take(3)}, " +
        s"ref-only ${want.diff(got).take(3)}")
  }

  test("q44b vector assignment + scoring is bit-identical to the " +
      "relational form, fixed and adaptive strides") {
    val (prof, n2) = profiles()
    def ref(st: Int): Set[(Long, Int, Long, Double)] = {
      val cents = n2.filter(col("user_id") % st === 0 && col("n2") > 0)
        .select(col("user_id").as("cid"), col("n2").as("cn2"))
      val cprof = prof.join(cents, prof("user_id") === cents("cid"))
        .select(col("cid"), col("hour"), col("v").as("cv"), col("cn2"))
      val cdot = prof.join(broadcast(cprof), Seq("hour"))
        .groupBy(col("user_id"), col("cid"))
        .agg(sum(col("v") * col("cv")).as("dot"), min(col("cn2")).as("cn2"))
      val assign = cdot
        .join(n2.filter(col("n2") > 0), Seq("user_id"))
        .select(col("user_id"), col("cid"),
          (col("dot").cast(DoubleType) /
            (sqrt(col("n2").cast(DoubleType)) *
              sqrt(col("cn2").cast(DoubleType)))).as("ccos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ccos").desc, col("cid").asc)))
        .filter(col("rn") === 1)
        .select("user_id", "cid")
      val cand = assign.as("a").join(assign.as("b"),
          col("a.cid") === col("b.cid") &&
            col("a.user_id") =!= col("b.user_id"))
        .select(col("a.user_id").as("qa"), col("b.user_id").as("qb"))
      asSet(refTail(cand, prof, n2))
    }
    val adaptive = graft.operators.Similarity.adaptiveStride(
      n2.filter(col("n2") > 0).count())
    Seq(5, adaptive).distinct.foreach { st =>
      val got = asSet(graft.operators.ExtendedQueries
        .q44bSeriesTopKClustered(spark, sf, stride = st))
      val want = ref(st)
      assert(got.nonEmpty && got == want,
        s"stride $st diff: engine-only ${got.diff(want).take(3)}, " +
          s"ref-only ${want.diff(got).take(3)}")
    }
  }
}
