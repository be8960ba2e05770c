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
  * idempotent foreachBatch). The POINTER SWAP is the commit point: a
  * replay is recognized either by the `_committed_<batchId>` marker or by
  * the pointer already naming `v<batchId>` (a crash can land between the
  * two; re-merging then would overwrite the directory the plan reads
  * from). DELETE winners are RETAINED in the stored snapshot as
  * tombstones — dropping them immediately would let a late out-of-order
  * event older than the delete resurrect the row on the next merge — and
  * filtered at the [[current]] read boundary; a production deploy ages
  * tombstones out past the source's lateness horizon. Versions older than
  * the previous one are pruned after each commit. In production this
  * store would be a Delta/Iceberg MERGE; the semantics here are identical
  * and the interface (`upsert(df, batchId)`) matches that swap-in.
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

  /** Full stored snapshot INCLUDING delete tombstones — the merge input. */
  private def raw(spark: SparkSession): Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(root.resolve(v).toString))

  /** Live rows (tombstones filtered) — the read surface. Null-safe: a row
    * whose delete-marker column is null (e.g. a payload that lost the field
    * round-tripping through the JSON DLQ and was replayed here) is LIVE —
    * a bare `=!=` would evaluate to null and silently drop it (same
    * coalesce guard as AppendVersionedSink.view). */
  def current(spark: SparkSession): Option[DataFrame] =
    raw(spark).map(_.filter(
      coalesce(col(isDeleteCol) =!= deleteValue, lit(true))))

  def committed(batchId: Long): Boolean =
    Files.exists(root.resolve(s"_committed_$batchId"))

  /** Merge one micro-batch; safe to replay. */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    if (committed(batchId)) return
    if (latestVersion.contains(s"v$batchId")) {
      // crashed between the pointer swap (the commit point) and the marker:
      // the merge already landed — backfill the marker, never re-merge into
      // the directory the current pointer reads from
      Files.write(root.resolve(s"_committed_$batchId"), Array.emptyByteArray)
      return
    }
    val spark = batch.sparkSession
    val unioned = raw(spark) match {
      case Some(cur) => cur.unionByName(batch.select(cur.columns.map(col): _*))
      case None => batch
    }
    // keep DELETE winners as tombstones (filtered in current()) so a late
    // event older than the delete loses the next merge instead of
    // resurrecting the row
    val merged = LatestState.latestPerKey(unioned,
      keyNames.map(col), orderNames.map(col))
    val newVersion = s"v$batchId"
    merged.write.mode("overwrite").parquet(root.resolve(newVersion).toString)
    val tmp = root.resolve(s"_LATEST.tmp$batchId")
    Files.write(tmp, newVersion.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    Files.write(root.resolve(s"_committed_$batchId"), Array.emptyByteArray)
    prune(batchId)
  }

  /** Drop versions and markers older than the previous batch — the current
    * version is live, the previous one covers in-flight readers that
    * resolved the pointer just before the swap; everything older is
    * unreachable. Keeps disk at O(2 × state), not O(batches × state). */
  private def prune(batchId: Long): Unit = {
    val vPat = "v(\\d+)".r
    val mPat = "_committed_(\\d+)".r
    // Files.list streams hold a directory fd until closed; prune runs once
    // per committed micro-batch on a long-lived driver, so leaking them to
    // GC would exhaust fds on exactly the deployments that matter
    def listed[A](p: java.nio.file.Path)(f: java.util.stream.Stream[java.nio.file.Path] => A): A = {
      val st = Files.list(p)
      try f(st) finally st.close()
    }
    def delRecursive(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        listed(p)(_.forEach(c => delRecursive(c)))
      Files.deleteIfExists(p)
      ()
    }
    listed(root)(_.forEach { p =>
      val drop = p.getFileName.toString match {
        case vPat(n) => n.toLong < batchId - 1
        case mPat(n) => n.toLong < batchId - 1
        case _ => false
      }
      if (drop) delRecursive(p)
    })
  }
}
