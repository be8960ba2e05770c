package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter join pruning — the runtime-filter technique a
  * 100 TB join needs when the dim side is too big to broadcast but its
  * KEY SET still fits a few megabytes of bits: build a bloom filter over
  * the build side's join keys (one aggregate, Spark's own
  * `BloomFilterAggregate` — the engine runtime-filter machinery, surfaced
  * as a library operator), ship the filter to the fact scan, and drop
  * non-joining fact rows BEFORE they shuffle. Blooms have no false
  * negatives, so the pruned join's result is exactly the plain join's —
  * the spec proves equality — while the shuffle moves only rows that can
  * match (false-positive stragglers bounded by the bits-per-key budget).
  *
  * Spark injects this same filter itself when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` fires, but only
  * under its own selectivity heuristics; the explicit operator is for
  * the pipeline author who KNOWS the key set is sparse (e.g. the d16 cut
  * list against the corpus, an incremental batch against a 100 TB
  * index), and wants the prune guaranteed, placed, and reusable across
  * several joins of the same batch.
  */
object BloomPrune {

  /** Default bits per expected key — ample margin (sub-0.01%
    * false-positive rate at the optimal hash count). */
  val BitsPerKey = 23L

  /** Build the filter over the build side's distinct join keys. The
    * returned bytes are the MODEL (like the p19 bucket table): a few MB
    * for millions of keys, collected once and embedded as a literal in
    * every consuming scan. Key hashing is `xxhash64`, the same hash
    * Spark's injected runtime filters use.
    *
    * Spark SILENTLY caps the aggregate's size parameters at the
    * runtime-filter confs (4M items / 64M bits by default) — above the
    * cap the filter would quietly degrade toward FPP≈1 and the prune
    * would stop pruning while still charging its build cost. The confs
    * are raised to cover `expectedKeys` BEFORE the aggregate runs, so
    * the bits-per-key contract holds at any batch size. */
  def buildFilter(build: DataFrame, keyCol: String,
      expectedKeys: Long): Array[Byte] = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    val conf = build.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    // the raise is scoped to THIS aggregate: the caps also size Spark's
    // own auto-injected runtime blooms, so leaving a 100M-key raise on
    // the shared session conf would silently inflate every later query's
    // injected filters — capture and restore around the build
    // getOption-based capture: a key the session never set must come back
    // UNSET (not pinned to today's hardcoded default) or the restore
    // itself changes conf.isModifiable/getOption observations downstream
    val prevItems = conf.getOption(itemsKey)
    val prevBits = conf.getOption(bitsKey)
    if (prevItems.getOrElse("4000000").toLong < expectedKeys)
      conf.set(itemsKey, expectedKeys.toString)
    if (prevBits.getOrElse("67108864").toLong < expectedKeys * BitsPerKey)
      conf.set(bitsKey, (expectedKeys * BitsPerKey).toString)
    def restore(key: String, prev: Option[String]): Unit = prev match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
    val row =
      try {
        val agg = ColumnBridge.column(
          new BloomFilterAggregate(
            ColumnBridge.expression(xxhash64(col(keyCol))),
            Literal(expectedKeys), Literal(expectedKeys * BitsPerKey))
            .toAggregateExpression())
        build.select(agg.as("bf")).head()
      } finally {
        restore(itemsKey, prevItems)
        restore(bitsKey, prevBits)
      }
    // empty build side → NULL sketch; an empty filter matches nothing,
    // which a zero-key bloom also guarantees, so normalize to null and
    // let semiPrune short-circuit
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** `might_contain` gate on the probe side: keeps every row whose key
    * the filter may hold (all true joiners + the bounded false-positive
    * tail). A null filter (empty build side) keeps nothing — the join
    * would be empty anyway. */
  def semiPrune(probe: DataFrame, keyCol: String,
      bloom: Array[Byte]): DataFrame =
    if (bloom == null) probe.filter(lit(false))
    else probe.filter(mightContain(bloom, col(keyCol)))

  private def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** The composed pattern: equi-join where the probe side is bloom-pruned
    * by the build side's key set before any exchange. Result is
    * row-identical to `probe.join(build, probeKey === buildKey)`. */
  def prunedJoin(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, expectedKeys: Long): DataFrame = {
    val bloom = buildFilter(build, buildKey, expectedKeys)
    semiPrune(probe, probeKey, bloom)
      .join(build, col(probeKey) === col(buildKey))
  }
}
