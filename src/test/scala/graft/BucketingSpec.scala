package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Bucketing, SaltedJoin}

/** Scale-layout operators: co-located bucketed joins (no shuffle) and
  * skew salting (same result, even partitions).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed join plans zero shuffle exchanges and matches unbucketed result") {
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    val customer = Tables.table(spark, sf, "customer")
    val orders = Tables.table(spark, sf, "orders")
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "custkey"),
      "customer_b", s"$tmp/customer", "custkey", 4)
    Bucketing.writeBucketed(
      orders.withColumnRenamed("o_custkey", "custkey"),
      "orders_b", s"$tmp/orders", "custkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "customer_b", "custkey")
      assert(Bucketing.isShuffleFree(joined), "bucketed join must not shuffle:\n" +
        joined.queryExecution.executedPlan.toString)
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() == expected)

      // the same layout also makes groupBy(key) shuffle-free
      val agg = spark.table("orders_b").groupBy("custkey").count()
      assert(Bucketing.isShuffleFree(agg), "bucketed agg must not shuffle:\n" +
        agg.queryExecution.executedPlan.toString)

      // non-vacuity: the same join over the UNBUCKETED tables must be
      // detected as shuffling (guards against a plan-text-matching bug
      // where the check always returned true)
      val unbucketed = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      assert(!Bucketing.isShuffleFree(unbucketed),
        "unbucketed SMJ should shuffle — isShuffleFree is vacuous")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }

  test("salted join equals plain join on skewed data") {
    // 90% of fact rows share key 1 — the classic hot key
    val fact = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(1L).as("k"),
        $"id".as("v"))
    val dim = spark.range(7).select($"id".as("k"), concat(lit("d"), $"id").as("name"))

    val plain = fact.join(dim, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    val salted = SaltedJoin.inner(fact, dim, "k", salts = 8).groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("selfPairsSalted: grid decomposition is pair-exact and spreads the hot group") {
    // one hot group (k=1, 60 rows — the LSH hot-bucket shape) + cold groups
    val df = spark.range(100).select(
      when($"id" < 60, lit(1L)).otherwise($"id" % 5 + 2).as("k"),
      $"id".as("v"))
    val hot = df.groupBy("k").agg(count(lit(1)).as("sz")).filter($"sz" > 20)
    assert(hot.count() == 1)
    val plain = df.as("x").join(df.as("y"),
        $"x.k" === $"y.k" && $"x.v" < $"y.v")
      .select($"x.v".as("a"), $"y.v".as("b"))
    val salted = SaltedJoin.selfPairsSalted(df, Seq("k"), "v", hot, salts = 4)
    val plainSet = plain.as[(Long, Long)].collect().toSet
    assert(salted.as[(Long, Long)].collect().toSet == plainSet)
    // each pair meets in EXACTLY one grid cell — no duplicate emission
    assert(salted.count() == plainSet.size)
    // the hot group's join-key cells each hold a fraction of its rows: the
    // largest single cell on either replicated side stays well under the
    // undecomposed group size (60 rows in ONE shuffle partition before)
    val cell = pmod(xxhash64($"v"), lit(4L)).cast("int")
    val maxCell = df.filter($"k" === 1).withColumn("c", cell)
      .groupBy("c").count().agg(max("count")).head().getLong(0)
    assert(maxCell < 60 / 2, s"grid cell of $maxCell rows is not a spread")
    val nCells = df.filter($"k" === 1).withColumn("c", cell)
      .select("c").distinct().count()
    assert(nCells == 4, "hot rows must occupy every grid cell")
  }

  test("salted count spreads the hot key and matches exact counts") {
    val fact = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(1L).as("k"))
    val exact = fact.groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    val salted = SaltedJoin.countByKeySalted(fact, "k", salts = 8)
      .as[(Long, Long)].collect().toMap
    assert(salted == exact)
  }
}
