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

  /** Skew-proof within-group self-pairing: all (a, b) pairs with
    * `a.idCol < b.idCol` inside each `keys` group — the LSH candidate
    * join shape — with the groups listed in `hotKeys` decomposed over a
    * `salts`×`salts` grid so one hot group no longer lands its entire
    * n² pair workload on one shuffle partition.
    *
    * Grid decomposition: each row gets a deterministic cell
    * `c = hash(id) mod salts`; the left side emits one copy per grid
    * column (cell(x), j), the right side one copy per grid row
    * (i, cell(y)), and the join key extends to (keys, i, j) — each pair
    * meets in EXACTLY one grid cell, so the output is bit-identical to
    * the plain self-join while the hot group's work spreads over salts²
    * join-key cells (n²/salts² comparisons each). Replication factor is
    * `salts` per side, applied ONLY to hot-group rows; cold groups join
    * plainly. `hotKeys` must be small (it is broadcast): by construction
    * it holds groups above an occupancy threshold, and there can only be
    * total/threshold of those.
    *
    * `keep` columns of each side ride along into the output as
    * `a_<col>` / `b_<col>` — for callers whose pair verification needs
    * the payload (q67's Levenshtein reads both names); carrying it
    * through the grid join beats two post-hoc id→payload joins (each a
    * full extra shuffle of the pair table).
    */
  def selfPairsSalted(df: DataFrame, keys: Seq[String], idCol: String,
      hotKeys: DataFrame, salts: Int,
      keep: Seq[String] = Nil): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val HotCol = "__graft_hot"
    val flagged = df.join(
      broadcast(hotKeys.select(keys.map(col): _*).distinct()
        .withColumn(HotCol, lit(true))),
      keys, "left")
    val cold = flagged.filter(col(HotCol).isNull).drop(HotCol)
    val hot = flagged.filter(col(HotCol)).drop(HotCol)
    splitPairs(cold, hot, keys, idCol, salts, keep)
  }

  /** [[selfPairsSalted]] with the occupancy probe built in: group size
    * from `groupBy.count` over `df`, groups above `hotThreshold` salted.
    * The probe is a SECOND pass over the input, and that is deliberate —
    * a count window over the join's own keys would fold the probe into
    * one pass, but an unbounded `WindowExec` buffers each group through
    * a single task, so the 10⁹-row hot group this function exists to
    * de-skew would serialize (with spill) at the probe BEFORE the grid
    * ever spreads it. The map-side-combined aggregate stays distributed
    * on exactly the skewed input that matters; the broadcast back is
    * bounded by total/threshold groups. */
  def selfPairsSaltedByOccupancy(df: DataFrame, keys: Seq[String],
      idCol: String, hotThreshold: Long, salts: Int,
      keep: Seq[String] = Nil): DataFrame = {
    val hot = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__graft_sz"))
      .filter(col("__graft_sz") > hotThreshold)
    // Pre-flight adaptivity (the AQE move at operator granularity): the
    // probe runs EAGERLY, and a corpus with no hot group — the common,
    // healthy shape — short-circuits to the plain within-group join.
    // Classification affects only the plan, never the output, so the
    // eager job is safe; what it buys is real: the cold plan carries
    // zero residual salting machinery (the empty hot side below is a
    // LocalRelation, so PropagateEmptyRelation erases the flag join,
    // the grid branch, and its union at optimization time), where the
    // always-salted plan pays ~6 extra scans/exchanges of pure
    // insurance on every run. Cost when hot IS nonempty: the probe
    // aggregate evaluates twice (once here, once under the broadcast) —
    // one extra map-side-combined pass, on exactly the corpus that
    // needs the grid anyway.
    if (hot.isEmpty) {
      val empty = df.sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        df.schema)
      splitPairs(df, empty, keys, idCol, salts, keep)
    } else selfPairsSalted(df, keys, idCol, hot, salts, keep)
  }

  /** The one pair-output projection every self-pairing shape shares:
    * `(a, b)` ids plus any `keep` payload as `a_<col>` / `b_<col>`. */
  private def pairSelect(j: DataFrame, idCol: String,
      keep: Seq[String]): DataFrame = j.select(
    col(s"x.$idCol").as("a") +: col(s"y.$idCol").as("b") +:
      (keep.map(k => col(s"x.$k").as(s"a_$k")) ++
        keep.map(k => col(s"y.$k").as(s"b_$k"))): _*)

  /** The shared cold/hot pairing core: plain within-group self-join for
    * `cold`, salts×salts grid decomposition for `hot` (each pair meets
    * in exactly one cell — see [[selfPairsSalted]]). */
  private def splitPairs(cold: DataFrame, hot: DataFrame,
      keys: Seq[String], idCol: String, salts: Int,
      keep: Seq[String]): DataFrame = {
    def pairCond(keyCols: Seq[String]) = keyCols
      .map(k => col(s"x.$k") === col(s"y.$k"))
      .reduce(_ && _) && col(s"x.$idCol") < col(s"y.$idCol")
    def pairSelect(j: DataFrame): DataFrame =
      SaltedJoin.pairSelect(j, idCol, keep)
    val coldPairs = pairSelect(cold.as("x").join(cold.as("y"), pairCond(keys)))
    // deterministic cell from the id, not monotonically_increasing_id:
    // both sides must agree on a row's cell for the grid to cover pairs
    val cell = pmod(xxhash64(col(idCol)), lit(salts.toLong)).cast("int")
    val grid = array((0 until salts).map(lit): _*)
    val xs = hot.withColumn("__gi", cell).withColumn("__gj", explode(grid))
    val ys = hot.withColumn("__gi", explode(grid)).withColumn("__gj", cell)
    val hotPairs = pairSelect(xs.as("x").join(ys.as("y"),
      pairCond(keys :+ "__gi" :+ "__gj")))
    coldPairs.unionByName(hotPairs)
  }

  /** Grid decomposition of EVERY group, directed: all (a, b) pairs with
    * `a.idCol =!= b.idCol` inside each `keys` group, each emitted exactly
    * once per direction. For keys that are STRUCTURALLY low-cardinality
    * and dense — a 24-value hour-of-day band, a handful of categories —
    * every group is hot by construction, so the occupancy probe and the
    * cold/hot split of [[selfPairsSalted]] are pure overhead: decompose
    * unconditionally. A directed pair (a, b) meets in exactly grid cell
    * (cell(a), cell(b)), so the output is bit-identical to the plain
    * directed self-join while the join key widens to (keys, i, j) —
    * |keys|·salts² shuffle cells of (n_group/salts)² comparisons each,
    * instead of one partition per group doing n_group². Replication is
    * `salts` copies per side of rows that are one key + one id wide —
    * plus any `keep` payload columns, carried through as `a_<col>` /
    * `b_<col>` so a consumer can score pairs IN the join stage instead
    * of re-joining the (much larger) pair stream back to the payload:
    * replicating N payload rows `salts`× is the cheap side of that
    * trade against exchanging the N²-shaped pair stream twice. */
  def selfPairsGridDirected(df: DataFrame, keys: Seq[String], idCol: String,
      salts: Int, keep: Seq[String] = Nil): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val cell = pmod(xxhash64(col(idCol)), lit(salts.toLong)).cast("int")
    val grid = array((0 until salts).map(lit): _*)
    val xs = df.withColumn("__gi", cell).withColumn("__gj", explode(grid))
    val ys = df.withColumn("__gi", explode(grid)).withColumn("__gj", cell)
    val cond = (keys :+ "__gi" :+ "__gj")
      .map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
      col(s"x.$idCol") =!= col(s"y.$idCol")
    pairSelect(xs.as("x").join(ys.as("y"), cond), idCol, keep)
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
