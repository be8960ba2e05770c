package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-state materialization and delete propagation — the reference's
  * signature operator family (SURVEY §2.5).
  *
  * The reference reaches these semantics through per-row warehouse
  * statements (`INSERT ... ON CONFLICT DO UPDATE` at
  * `src/sinks/postgres.py:119-132`, `DELETE` at `postgres.py:93-101`,
  * ClickHouse ReplacingMergeTree at `scripts/setup-local-env.sh:184-186`);
  * here they are set-based plans: one shuffle on the entity key, then a
  * codegen'd window — the standard scalable shape for last-write-wins.
  */
object LatestState {

  /** Keep only the winning (latest) row per key. Last-write-wins ordering
    * is (orderCols desc) with deterministic tie-breaks — callers pass e.g.
    * `Seq(col("timestamp_micros"), col("event_id"))` mirroring
    * `spec.md:116`'s conflict resolution. */
  def latestPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Upsert-view semantics: latest row per key, excluding keys whose final
    * event is a delete (ReplacingMergeTree + delete-propagation read view,
    * `src/sinks/clickhouse.py:85-87`). */
  def materialize(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      isDelete: Column): DataFrame =
    latestPerKey(df, keys, order).filter(!isDelete)

  /** Anti-join form of delete propagation: drop every key that has a
    * delete marker (`src/sinks/postgres.py:93-101` applies deletes by
    * partition key). `markers` must contain the key columns. */
  def propagateDeletes(current: DataFrame, markers: DataFrame,
      keyNames: Seq[String]): DataFrame =
    current.join(markers.select(keyNames.map(col): _*).distinct(),
      keyNames, "left_anti")
}
