package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.LatestState

/** A last-write-wins upsert table over parquet with atomic version swap.
  *
  * Plays the role of the reference's idempotent warehouse upsert
  * (`INSERT ... ON CONFLICT (pk) DO UPDATE`, `src/sinks/postgres.py:119-132`)
  * plus delete propagation (`postgres.py:93-101`) for the pure-Spark slice.
  * Each `upsert` merges a micro-batch into the current snapshot with
  * row_number last-write-wins (ordered by `orderCols` desc), drops keys
  * whose winning row is a DELETE, writes a new versioned directory, then
  * atomically swaps a pointer file — readers never see a partial write.
  *
  * Idempotence: the merge is a pure function of (current state ∪ batch)
  * under last-write-wins, so replaying a batch after a crash converges to
  * the same snapshot (the Spark exactly-once recipe: checkpoint +
  * idempotent foreachBatch). A `_committed_<batchId>` marker additionally
  * short-circuits exact re-deliveries. In production this store would be a
  * Delta/Iceberg MERGE; the semantics here are identical and the interface
  * (`upsert(df, batchId)`) matches that swap-in.
  */
final class UpsertStateStore(
    val tableDir: String,
    keyNames: Seq[String],
    orderNames: Seq[String],
    isDeleteCol: String = "event_type",
    deleteValue: String = "DELETE") {

  private val root = Paths.get(tableDir)
  private val pointer = root.resolve("_LATEST")
  Files.createDirectories(root)

  private def latestVersion: Option[String] =
    if (Files.exists(pointer))
      Some(new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim)
    else None

  def current(spark: SparkSession): Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(root.resolve(v).toString))

  def committed(batchId: Long): Boolean =
    Files.exists(root.resolve(s"_committed_$batchId"))

  /** Merge one micro-batch; safe to replay. */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    if (committed(batchId)) return
    val spark = batch.sparkSession
    val unioned = current(spark) match {
      case Some(cur) => cur.unionByName(batch.select(cur.columns.map(col): _*))
      case None => batch
    }
    val merged = LatestState.latestPerKey(unioned,
        keyNames.map(col), orderNames.map(col))
      .filter(col(isDeleteCol) =!= deleteValue)
    val newVersion = s"v$batchId"
    merged.write.mode("overwrite").parquet(root.resolve(newVersion).toString)
    val tmp = root.resolve(s"_LATEST.tmp$batchId")
    Files.write(tmp, newVersion.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    Files.write(root.resolve(s"_committed_$batchId"), Array.emptyByteArray)
  }
}
