package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins and aggregations.
  *
  * A single hot key (one user with 10^9 events, one null-heavy dimension)
  * lands an entire key's rows in one shuffle partition and serializes the
  * stage. AQE's skew-join splitting handles sort-merge joins; salting is
  * the general fix that also covers aggregations and hash joins: fan the
  * hot side out across `salts` sub-keys, replicate the small side across
  * all sub-keys, join/aggregate on (key, salt), then drop/merge the salt.
  * The result is bit-identical to the unsalted operator — only the
  * partitioning changes.
  */
object SaltedJoin {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join with the skewed (large) side salted into `salts`
    * sub-keys. `dim` rows are replicated `salts` times — keep it the
    * smaller side (salting a broadcast-able dim is pointless; use
    * `broadcast()` there instead).
    */
  def inner(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // Any per-row spread works; id-based keeps it cheap and shuffle-free
    // to compute. Correctness never depends on the salt value.
    val saltedFact = fact.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val explodedDim = dim.withColumn(SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedDim, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Skew-proof count/sum aggregation: partial agg on (key, salt) — which
    * distributes the hot key across `salts` partitions — then final agg on
    * key. Spark's own partial aggregation already does this for algebraic
    * aggregates; the two-level form matters for `collect_list`-style or
    * high-cardinality-distinct aggregations where map-side combine can't
    * shrink the hot key.
    */
  def countByKeySalted(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    df.withColumn(SaltCol,
        pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col(SaltCol)).agg(count(lit(1)).as("partial_n"))
      .groupBy(col(key)).agg(sum(col("partial_n")).as("n"))
  }
}
