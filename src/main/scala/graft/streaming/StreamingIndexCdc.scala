package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** A change event on the vector corpus — the commit-log op convention
  * (I insert / U update / D delete, `ChangeEvent`'s op byte) aimed at
  * the ANN index. `seq` is the change's commit-log position (the total
  * order CDC guarantees per key); deletes carry no embedding. */
final case class VecChange(seq: Long, vecId: Long, op: String,
    embedding: Seq[Float])

/** CDC-driven IVF-PQ index maintenance — the full change-feed story the
  * reference's pipeline applies to warehouse tables, applied to the ANN
  * index: [[StreamingIndexIngest]] handles an insert-only feed; this
  * consumes a MIXED I/U/D stream. Per micro-batch (foreachBatch):
  * the batch's last op per key wins (by `seq` — the same LWW rule as
  * the upsert sink), upserts are assigned + PQ-encoded through the
  * FROZEN artifacts and appended as versioned index rows, deletes land
  * as tombstone rows. Both sides write `batch_id=N` overwrite
  * partitions — idempotent under crash replay.
  *
  * The read view ([[readIndex]]) resolves versions exactly like
  * [[graft.sinks.AppendVersionedSink]]'s dedup view: per vector the
  * highest-`seq` event wins; a winning tombstone removes the vector, a
  * winning upsert serves its (single) encode. [[compact]] materializes
  * the view and discards superseded versions + tombstones — the
  * OPTIMIZE FINAL analog for the index.
  *
  * Shape at 100 TB: per-batch cost is batch-proportional (broadcast
  * artifacts; no corpus reads on the write path). The version
  * resolution in the read view is one shuffle keyed on vec_id over
  * index rows — the read-amplification compaction exists to erase, on
  * the same cadence a versioned warehouse sink compacts. */
object StreamingIndexCdc {

  private val TombSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("seq", LongType)))

  /** Apply ONE batch of change events `(seq, vec_id, op, embedding)` to
    * the on-disk index — the foreachBatch body, callable directly for
    * batch backfills and replay. Last op per key (highest `seq`) wins
    * within the batch; I and U are the same operation against an index
    * (encode + version-append), as in any upsert sink. */
  def applyBatch(batch: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String, batchId: Long): Unit = {
    val latest = batch
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
    val ups = latest.filter(col("op") =!= "D")
      .select(col("vec_id"), col("seq"), col("embedding"))
    val dels = latest.filter(col("op") === "D").select("vec_id", "seq")
    StreamingIndexIngest
      .encode(ups.select("vec_id", "embedding"), idx)
      .join(ups.select("vec_id", "seq"), "vec_id")
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexDir/batch_id=$batchId")
    dels.write.mode("overwrite").parquet(s"$tombDir/batch_id=$batchId")
  }

  /** Attach the maintainer to a streaming change frame
    * `(seq, vec_id, op, embedding)`. */
  def attach(changeStream: DataFrame, idx: StreamingSimScorer.Index,
      indexDir: String, tombDir: String,
      checkpointDir: String): StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idx, indexDir, tombDir, batchId)
      }
      .start()

  /** Tombstones, tolerant of a delete-free feed (missing/empty dir reads
    * as an empty frame — the DLQ convention). */
  private def tombstones(s: SparkSession, tombDir: String): DataFrame =
    // schema-explicit read: a delete-free feed leaves `batch_id=N` dirs
    // with no part files (or no dir at all) — both must read as empty,
    // never throw schema inference errors
    if (new java.io.File(tombDir).isDirectory)
      s.read.schema(TombSchema).parquet(tombDir).select("vec_id", "seq")
    else s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], TombSchema)

  /** The live index — version resolution over the raw versioned rows:
    * per vector, the highest-`seq` event wins across encodes AND
    * tombstones; survivors serve exactly their winning encode's rows.
    * Output columns: the [[StreamingIndexIngest.encode]] contract
    * `(vec_id, nrm, m, code, cid)` plus `seq`. */
  def readIndex(s: SparkSession, indexDir: String,
      tombDir: String): DataFrame = {
    val enc = s.read.parquet(indexDir)
    val versions = enc.select("vec_id", "seq").distinct()
      .withColumn("deleted", lit(false))
      .unionByName(tombstones(s, tombDir).withColumn("deleted", lit(true)))
    val live = versions.groupBy("vec_id")
      .agg(max(struct(col("seq"), col("deleted"))).as("v"))
      .filter(!col("v.deleted"))
      .select(col("vec_id"), col("v.seq").as("seq"))
    enc.join(live, Seq("vec_id", "seq"))
      .select("vec_id", "seq", "nrm", "m", "code", "cid")
  }

  /** Materialize the live view into a fresh cid-partitioned index and
    * drop superseded versions + tombstones — the explicit compaction
    * (OPTIMIZE FINAL analog). A reader of `outDir` needs no tombstone
    * side at all ([[readIndex]] with an empty tombstone dir returns the
    * same rows — spec-proven). */
  def compact(s: SparkSession, indexDir: String, tombDir: String,
      outDir: String): Unit =
    readIndex(s, indexDir, tombDir)
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite").partitionBy("batch_id", "cid")
      .parquet(outDir)
}
