package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-schema robustness: the driver has regenerated the corpus with a
  * different physical `events.ts` encoding mid-build once already
  * (TIMESTAMP(NANOS)-as-long → TIMESTAMP(MICROS), which silently broke all
  * 8 events queries for two rounds). `Tables.events` must yield identical
  * `ts_us` semantics under every encoding it can meet. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one known instant: 2024-03-01T12:34:56.789012Z
  private val instantUs = 1709296496789012L

  test("micros-encoded events (TimestampType) yield epoch-micro ts_us") {
    val dir = Files.createTempDirectory("tables-micros").toString
    Seq((1L, instantUs, 7L))
      .toDF("event_id", "us", "user_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts_us").dataType == LongType)
    assert(got.select("ts_us").as[Long].head() == instantUs)
  }

  test("nanos-as-long events (LongType) yield truncated epoch-micro ts_us") {
    // parquet TIMESTAMP(NANOS) surfaces as raw int64 under
    // spark.sql.legacy.parquet.nanosAsLong (set in SparkSpec) — a plain
    // BIGINT fixture exercises exactly the code path that reader produces
    val dir = Files.createTempDirectory("tables-nanos").toString
    Seq((1L, instantUs * 1000L + 999L, 7L)) // sub-micro nanos must truncate
      .toDF("event_id", "ts", "user_id")
      .write.parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts_us").dataType == LongType)
    assert(got.select("ts_us").as[Long].head() == instantUs)
  }

  test("timestamp_ntz events yield the same ts_us under the UTC session") {
    val dir = Files.createTempDirectory("tables-ntz").toString
    Seq((1L, instantUs, 7L))
      .toDF("event_id", "us", "user_id")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")
      .write.parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.select("ts_us").as[Long].head() == instantUs)
  }

  test("both encodings of one instant stream agree row-for-row") {
    val us = Seq.tabulate(50)(i => instantUs + i * 1000001L)
    val dirA = Files.createTempDirectory("tables-eq-micros").toString
    val dirB = Files.createTempDirectory("tables-eq-nanos").toString
    us.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "u")
      .withColumn("ts", timestamp_micros(col("u"))).drop("u")
      .write.parquet(s"$dirA/events.parquet")
    us.zipWithIndex.map { case (u, i) => (i.toLong, u * 1000L) }
      .toDF("event_id", "ts")
      .write.parquet(s"$dirB/events.parquet")
    val a = Tables.events(spark, dirA).select("event_id", "ts_us")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Tables.events(spark, dirB).select("event_id", "ts_us")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("live corpus: every column the engine consumes is present and typed") {
    // the driver regenerates the corpus between rounds and has already
    // changed a physical type once (events.ts) — fail LOUDLY in specs the
    // moment a consumed column disappears or changes shape, instead of
    // surfacing as N scattered analysis errors at verify time
    import org.apache.spark.sql.types._
    val dir = "/root/testdata/sf0.001"
    val required: Map[String, Seq[String]] = Map(
      "documents" -> Seq("doc_id", "text", "lang", "source"),
      "embeddings" -> Seq("vec_id", "embedding", "label"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
        "props"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "region" -> Seq("r_regionkey", "r_name"))
    required.foreach { case (t, cols) =>
      val schema = Tables.table(spark, dir, t).schema
      val missing = cols.filterNot(schema.fieldNames.contains)
      assert(missing.isEmpty, s"$t lost consumed columns: $missing")
    }
    val docs = Tables.table(spark, dir, "documents").schema
    assert(docs("text").dataType == StringType)
    assert(Set[DataType](LongType, IntegerType).contains(docs("doc_id").dataType))
    val emb = Tables.table(spark, dir, "embeddings").schema
    assert(emb("embedding").dataType.isInstanceOf[ArrayType],
      s"embeddings.embedding is ${emb("embedding").dataType}")
  }

  test("live corpus: every table loads, events.ts_us is sane epoch micros") {
    val dir = "/root/testdata/sf0.001"
    Tables.all.foreach { t =>
      val df = Tables.table(spark, dir, t)
      assert(df.schema.nonEmpty, s"$t: empty schema")
      assert(df.limit(1).count() == 1, s"$t: empty table")
    }
    val bounds = Tables.events(spark, dir)
      .agg(min("ts_us"), max("ts_us")).as[(Long, Long)].head()
    // epoch micros between 2000-01-01 and 2100-01-01
    assert(bounds._1 > 946684800000000L && bounds._2 < 4102444800000000L,
      s"events.ts_us outside sane epoch-micro bounds: $bounds")
  }
}
