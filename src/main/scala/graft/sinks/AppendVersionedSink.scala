package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Append-only versioned sink with a dedup read view — the engine's analog
  * of the reference's ClickHouse path: the sink only ever appends
  * (`src/sinks/clickhouse.py:81-145` — DELETEs skipped, dedup deferred to
  * `ReplacingMergeTree` collapsing by ORDER BY key), and exactness is
  * restored at READ time by a last-write-wins view
  * (`specs/.../research.md:68-74` accepts transient duplicates; SURVEY
  * §7.6 requires the read view so query results stay exact).
  *
  * Append scales trivially (no read-modify-write, any number of writers);
  * the view is one shuffle on the key — the same trade ClickHouse makes,
  * expressed relationally.
  */
final class AppendVersionedSink(val tableDir: String, keyNames: Seq[String],
    versionCol: String, isDeleteCol: String = "event_type",
    deleteValue: String = "DELETE") {

  /** Append a micro-batch; a constant `_batch_id` column makes replays
    * observable (and removable) downstream. */
  def append(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("_batch_id", lit(batchId))
      .write.mode("append").parquet(tableDir)

  /** Raw appended rows (may contain duplicates + tombstones). */
  def raw(spark: SparkSession): DataFrame = spark.read.parquet(tableDir)

  /** The exact read view: latest version per key (ties broken by highest
    * `_batch_id` — redeliveries are byte-identical so either wins), with
    * delete tombstones dropped. */
  def view(spark: SparkSession): DataFrame = {
    val w = Window.partitionBy(keyNames.map(col): _*)
      .orderBy(col(versionCol).desc, col("_batch_id").desc)
    raw(spark)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(isDeleteCol) =!= deleteValue)
      .drop("__rn", "_batch_id")
  }

  /** Compaction — the ReplacingMergeTree background merge, run explicitly
    * (ClickHouse `OPTIMIZE FINAL` analog): rewrite the table as its dedup
    * view so reads stop paying the per-query collapse and storage drops to
    * one row per live key. Tombstones are aged out with everything they
    * shadow. Write-temp-then-swap keeps a crash from destroying the table
    * (parquet dirs move atomically on a posix fs); readers racing the swap
    * re-list and retry, exactly like a ClickHouse part swap. */
  def compact(spark: SparkSession): Unit = {
    val compacted = view(spark)
      .withColumn("_batch_id", lit(-1L)) // compacted rows predate any batch
    val tmp = tableDir + ".compact-tmp"
    val old = tableDir + ".compact-old"
    compacted.write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(tableDir)
    val oldDir = new java.io.File(old)
    if (oldDir.exists()) {
      oldDir.listFiles().foreach(_.delete()); oldDir.delete()
    }
    dir.renameTo(oldDir)
    new java.io.File(tmp).renameTo(dir)
    oldDir.listFiles().foreach(_.delete()); oldDir.delete()
  }
}
