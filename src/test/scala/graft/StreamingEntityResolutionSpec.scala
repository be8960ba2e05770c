package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.ExtendedQueries
import graft.streaming.{EntityRecord, StreamingEntityResolution}

/** Stream↔batch parity for entity resolution: the per-micro-batch
  * resolver must end at exactly the q68 entity table, with per-batch
  * writes bounded by newcomers + affected components, and crash replay
  * a no-op. */
class StreamingEntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def entitySet(df: DataFrame): Set[(Long, Long, Boolean)] = df
    .select("c_custkey", "entity_id", "is_canonical").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  /** Keys written into one batch partition. Batch dirs are laid out by
    * `blk`; an empty batch leaves NO part files (just _SUCCESS), which
    * plain parquet read can't schema-infer — walk first. */
  private def readPartitionKeys(store: String, batchId: Long): Set[Long] = {
    val dir = java.nio.file.Paths.get(s"$store/batch_id=$batchId")
    val walk = java.nio.file.Files.walk(dir)
    val hasData =
      try walk.anyMatch(p => p.toString.endsWith(".parquet"))
      finally walk.close()
    if (!hasData) Set.empty
    else spark.read.parquet(dir.toString)
      .select("custkey").as[Long].collect().toSet
  }

  test("stream-final entity table equals batch q68 on the customer corpus") {
    val cust = Tables.table(spark, sf, "customer")
      .select($"c_custkey", $"c_name").as[(Long, String)].collect()
      .sortBy(_._1).map { case (k, n) => EntityRecord(k, n) }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EntityRecord]
    val base = Files.createTempDirectory("graft-ser")
    val store = base.resolve("store").toString
    val q = StreamingEntityResolution.attach(input.toDF(), store,
      base.resolve("ckpt").toString)
    try {
      cust.grouped(math.max(1, cust.length / 3)).foreach { g =>
        input.addData(g.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = entitySet(
      StreamingEntityResolution.entityTable(spark, store))
    val batch = entitySet(ExtendedQueries.q68EntityClusters(spark, sf))
    assert(batch.nonEmpty && streamed == batch)
  }

  test("incremental writes are bounded, cross-batch merges re-label, " +
      "and replaying a batch changes nothing") {
    val base = Files.createTempDirectory("graft-ser-inc")
    val store = base.resolve("store").toString
    def apply(batchId: Long, recs: (Long, String)*): Unit =
      StreamingEntityResolution.applyBatch(
        recs.toDF("custkey", "name"), store, batchId)
    def resolved: Map[Long, Long] = StreamingEntityResolution
      .readResolved(spark, store).select("custkey", "entity_id")
      .as[(Long, Long)].collect().toMap
    def partitionKeys(batchId: Long): Set[Long] =
      readPartitionKeys(store, batchId)

    // batch 0: two separate entities in one block ("...A"/"...B" are 2
    // edits apart — no match) plus an unrelated block
    val blkA = "AAAAAAAAAAAAAAAA" // 16-char block key
    apply(0L, 10L -> s"${blkA}xA", 20L -> s"${blkA}yB", 30L -> "C000000000000030")
    assert(resolved == Map(10L -> 10L, 20L -> 20L, 30L -> 30L))

    // batch 1: a far-away block — writes ONLY its own rows (no affected
    // components), the incremental-cost claim made checkable
    apply(1L, 40L -> "D000000000000040")
    assert(partitionKeys(1L) == Set(40L))
    assert(resolved == Map(10L -> 10L, 20L -> 20L, 30L -> 30L, 40L -> 40L))

    // batch 2: a bridge record one edit from BOTH members — merges the
    // two entities; the whole merged component re-labels to the min,
    // and the untouched entities (30, 40) are NOT rewritten
    apply(2L, 5L -> s"${blkA}xB")
    assert(partitionKeys(2L) == Set(5L, 10L, 20L))
    assert(resolved == Map(5L -> 5L, 10L -> 5L, 20L -> 5L,
      30L -> 30L, 40L -> 40L))

    // crash replay of batch 2: recomputed from the AS-OF-<2 store view,
    // byte-identical state — a re-delivered batch cannot double or drop
    apply(2L, 5L -> s"${blkA}xB")
    assert(partitionKeys(2L) == Set(5L, 10L, 20L))
    assert(resolved == Map(5L -> 5L, 10L -> 5L, 20L -> 5L,
      30L -> 30L, 40L -> 40L))

    // a re-delivered already-resolved key is a no-op (insert-shaped ER)
    apply(3L, 10L -> s"${blkA}xA")
    assert(partitionKeys(3L).isEmpty && resolved.size == 5)
  }

  test("a redelivered key whose name changed blocks is still a no-op: " +
      "no second row in the new block, newcomers beside it unaffected") {
    val base = Files.createTempDirectory("graft-ser-reblk")
    val store = base.resolve("store").toString
    val blkA = "AAAAAAAAAAAAAAAA"
    val blkB = "B000000000000000"
    def apply(batchId: Long, recs: (Long, String)*): Unit =
      StreamingEntityResolution.applyBatch(
        recs.toDF("custkey", "name"), store, batchId)
    def resolved: Map[Long, (String, Long)] = StreamingEntityResolution
      .readResolved(spark, store).select("custkey", "blk", "entity_id")
      .as[(Long, String, Long)].collect()
      .map { case (k, b, e) => k -> (b, e) }.toMap

    apply(0L, 10L -> s"${blkA}xA")
    assert(resolved == Map(10L -> (blkA, 10L)))

    // the redelivery lands in block B, where the block-pruned prior
    // cannot see key 10 — the existence check must still drop it, or
    // the key forks across two block partitions and the pruned read's
    // per-block-latest-is-global-latest soundness claim breaks
    apply(1L, 10L -> s"${blkB}10", 50L -> s"${blkB}50")
    assert(readPartitionKeys(store, 1L) == Set(50L))
    assert(resolved == Map(10L -> (blkA, 10L), 50L -> (blkB, 50L)))

    // replay of the redelivering batch recomputes identically
    apply(1L, 10L -> s"${blkB}10", 50L -> s"${blkB}50")
    assert(readPartitionKeys(store, 1L) == Set(50L))
    assert(resolved == Map(10L -> (blkA, 10L), 50L -> (blkB, 50L)))
  }

  test("store scan is partition-pruned to the batch's blocks, and the " +
      "pruned view equals the full view restricted to them") {
    val base = Files.createTempDirectory("graft-ser-prune")
    val store = base.resolve("store").toString
    val blkA = "AAAAAAAAAAAAAAAA"
    val blkB = "B000000000000000"
    StreamingEntityResolution.applyBatch(
      Seq(10L -> s"${blkA}xA", 20L -> s"${blkB}20").toDF("custkey", "name"),
      store, 0L)
    StreamingEntityResolution.applyBatch(
      Seq(30L -> s"${blkA}xB").toDF("custkey", "name"), store, 1L)
    // the block-restricted read prunes blk partitions in the PLAN (the
    // CorpusShardSink proof: a real partition filter beyond IsNotNull),
    // which is exactly the scan applyBatch pays per micro-batch
    val pruned = StreamingEntityResolution.readResolved(spark, store,
      blocks = Some(Seq(blkA)))
    assert(graft.sinks.CorpusShardSink.prunesPartitions(pruned),
      "blk restriction must reach the scan as a partition filter")
    val full = StreamingEntityResolution.readResolved(spark, store)
    assert(pruned.select("custkey", "entity_id").as[(Long, Long)]
      .collect().toSet ==
      full.filter($"blk" === blkA).select("custkey", "entity_id")
        .as[(Long, Long)].collect().toSet)
    assert(pruned.count() == 2 && full.count() == 3)
  }

  test("compaction folds history into the base partition: view unchanged, " +
      "replay after compaction is a no-op, maintenance continues") {
    val base = Files.createTempDirectory("graft-ser-compact")
    val store = base.resolve("store").toString
    val compacted = base.resolve("store2").toString
    val blkA = "AAAAAAAAAAAAAAAA"
    def apply(dir: String, batchId: Long, recs: (Long, String)*): Unit =
      StreamingEntityResolution.applyBatch(
        recs.toDF("custkey", "name"), dir, batchId)
    def resolved(dir: String): Map[Long, Long] = StreamingEntityResolution
      .readResolved(spark, dir).select("custkey", "entity_id")
      .as[(Long, Long)].collect().toMap
    // the inc-spec fixture: two entities, then a bridging merge
    apply(store, 0L, 10L -> s"${blkA}xA", 20L -> s"${blkA}yB",
      30L -> "C000000000000030")
    apply(store, 1L, 40L -> "D000000000000040")
    apply(store, 2L, 5L -> s"${blkA}xB")
    val before = resolved(store)
    assert(before == Map(5L -> 5L, 10L -> 5L, 20L -> 5L,
      30L -> 30L, 40L -> 40L))

    StreamingEntityResolution.compact(spark, store, compacted)
    // base+tail view ≡ pre-compaction view, and ONLY the base exists
    // (plus the key sidecar, itself compacted into its own base)
    assert(resolved(compacted) == before)
    assert(new java.io.File(compacted).listFiles().map(_.getName).toSet ==
      Set(s"batch_id=${StreamingEntityResolution.CompactedBatchId}", "_keys"))
    assert(new java.io.File(s"$compacted/_keys").listFiles()
      .map(_.getName).toSet ==
      Set(s"batch_id=${StreamingEntityResolution.CompactedBatchId}"))

    // crash-replay of a pre-compaction batch onto the compacted store:
    // its effects are already baked into the base, so the newcomer set
    // is empty — an empty partition lands and the view is unchanged
    apply(compacted, 2L, 5L -> s"${blkA}xB")
    assert(readPartitionKeys(compacted, 2L).isEmpty)
    assert(resolved(compacted) == before)

    // maintenance continues on the compacted store: a NEW record one
    // edit from 30 (same 16-char block) joins its entity and nothing
    // else is rewritten
    apply(compacted, 3L, 31L -> "C000000000000030Z")
    assert(readPartitionKeys(compacted, 3L) == Set(30L, 31L))
    assert(resolved(compacted) == Map(5L -> 5L, 10L -> 5L, 20L -> 5L,
      30L -> 30L, 31L -> 30L, 40L -> 40L))
  }

  test("newcomer existence probe reads only the batch's hash buckets " +
      "(partition-pruned), and equals the full key set on those buckets") {
    val base = Files.createTempDirectory("graft-ser-keyprobe")
    val store = base.resolve("store").toString
    val blkA = "AAAAAAAAAAAAAAAA"
    // keys spread across blocks AND hash buckets
    val keys = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L)
    StreamingEntityResolution.applyBatch(
      keys.take(4).map(k => k -> s"$blkA$k").toDF("custkey", "name"),
      store, 0L)
    StreamingEntityResolution.applyBatch(
      keys.drop(4).map(k => k -> s"B000000000000$k").toDF("custkey", "name"),
      store, 1L)
    // the bucket function the maintainer uses, evaluated the same way
    val bucketOf: Map[Long, Int] = keys.toDF("custkey")
      .select($"custkey", pmod(hash($"custkey"),
        lit(StreamingEntityResolution.KeyBuckets)).as("b"))
      .as[(Long, Int)].collect().toMap
    val probeKeys = Seq(10L, 50L)
    val buckets = probeKeys.map(bucketOf).distinct
    val probe = StreamingEntityResolution.keySidecar(spark, store,
      beforeBatch = 2L, buckets = buckets)
    // the bucket restriction reaches the scan as a PARTITION filter —
    // the probe reads the batch's buckets, never the key history
    assert(graft.sinks.CorpusShardSink.prunesPartitions(probe),
      "bucket restriction must reach the sidecar scan as a partition filter")
    // and the pruned probe is value-complete for those buckets: every
    // key hashing into them is visible (global existence preserved)
    assert(probe.as[Long].collect().toSet ==
      keys.filter(k => buckets.contains(bucketOf(k))).toSet)
    // as-of semantics: a replayed batch 1 cannot see its own keys
    val replay = StreamingEntityResolution.keySidecar(spark, store,
      beforeBatch = 1L, buckets = keys.map(bucketOf).distinct)
    assert(replay.as[Long].collect().toSet == keys.take(4).toSet)
  }

  test("pre-sidecar store: probe falls back to the full scan (redelivered " +
      "key still blocked), no sidecar starts mid-history, compact migrates") {
    val base = Files.createTempDirectory("graft-ser-legacy")
    val store = base.resolve("store").toString
    val compacted = base.resolve("store2").toString
    val blkA = "AAAAAAAAAAAAAAAA"
    val blkB = "B000000000000000"
    def apply(dir: String, batchId: Long, recs: (Long, String)*): Unit =
      StreamingEntityResolution.applyBatch(
        recs.toDF("custkey", "name"), dir, batchId)
    def resolved(dir: String): Map[Long, (String, Long)] =
      StreamingEntityResolution.readResolved(spark, dir)
        .select("custkey", "blk", "entity_id")
        .as[(Long, String, Long)].collect()
        .map { case (k, b, e) => k -> (b, e) }.toMap
    def keysDirOf(dir: String) = new java.io.File(s"$dir/_keys")

    apply(store, 0L, 10L -> s"${blkA}xA")
    // simulate a store written before the sidecar existed
    val hp = new org.apache.hadoop.fs.Path(s"$store/_keys")
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    assert(!keysDirOf(store).exists())

    // the redelivered key changed blocks; with no sidecar the probe
    // must fall back to the full-store scan and still block it
    apply(store, 1L, 10L -> s"${blkB}10", 50L -> s"${blkB}50")
    assert(resolved(store) == Map(10L -> (blkA, 10L), 50L -> (blkB, 50L)))
    // and NO sidecar may start mid-history: one that misses key 10
    // would wave the next redelivery through
    assert(!keysDirOf(store).exists())

    // compaction materializes the sidecar from the full resolved key
    // set — the migration path for pre-sidecar stores
    StreamingEntityResolution.compact(spark, store, compacted)
    assert(keysDirOf(compacted).exists())
    // post-migration: probe is sidecar-backed (pruned) and still
    // blocks a block-changing redelivery of a pre-sidecar key
    apply(compacted, 2L, 10L -> "C00000000000cc10", 60L -> "C00000000000cc60")
    assert(resolved(compacted) == Map(10L -> (blkA, 10L),
      50L -> (blkB, 50L), 60L -> ("C00000000000cc60".take(16), 60L)))
    assert(readPartitionKeys(compacted, 2L) == Set(60L))
  }

  test("a store batch missing its sidecar counterpart (crash between the " +
      "two writes, never replayed) is healed before the sidecar is " +
      "trusted: a block-changing redelivery stays blocked") {
    val base = Files.createTempDirectory("graft-ser-heal")
    val store = base.resolve("store").toString
    val blkA = "AAAAAAAAAAAAAAAA"
    val blkB = "B000000000000000"
    def apply(batchId: Long, recs: (Long, String)*): Unit =
      StreamingEntityResolution.applyBatch(
        recs.toDF("custkey", "name"), store, batchId)
    apply(0L, 10L -> s"${blkA}x10")
    apply(1L, 20L -> s"${blkA}x20")
    // simulate the crash window: batch 1's store partition landed but
    // its sidecar partition did not, and batch 1 is never replayed
    val hp = new org.apache.hadoop.fs.Path(s"$store/_keys/batch_id=1")
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(hp))
    fs.delete(hp, true)
    // batch 2 redelivers key 20 under a CHANGED block — an unhardened
    // bucket-pruned probe would miss it (its key is only in the lost
    // sidecar partition) and fork the key across two blocks
    apply(2L, 20L -> s"${blkB}20", 30L -> s"${blkB}30")
    val rows = StreamingEntityResolution.readResolved(spark, store)
      .select("custkey", "blk").as[(Long, String)].collect().toMap
    assert(rows == Map(10L -> blkA, 20L -> blkA, 30L -> blkB),
      s"key 20 must keep its original block, got $rows")
    // and the heal backfilled the missing partition, so later batches
    // probe a complete sidecar. The backfill copies the WHOLE store
    // partition — newcomer 20 plus relabeled member 10 (x10/x20 are
    // within edit 1, so batch 1 merged them); the extra resolved key
    // is harmless for an existence probe.
    assert(fs.exists(hp))
    assert(spark.read.parquet(s"$store/_keys/batch_id=1")
      .select("custkey").as[Long].collect().toSet == Set(10L, 20L))
  }

  test("kill mid-stream, restart from checkpoint: final state still q68-exact") {
    val cust = Tables.table(spark, sf, "customer")
      .select($"c_custkey", $"c_name").as[(Long, String)].collect()
      .sortBy(_._1).map { case (k, n) => EntityRecord(k, n) }
    val (first, rest) = cust.splitAt(cust.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft-ser-restart")
    val store = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString

    val input = MemoryStream[EntityRecord]
    val q1 = StreamingEntityResolution.attach(input.toDF(), store, ckpt)
    try { input.addData(first.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    // kill window: the second half arrives while nothing is running;
    // the restart recovers from the SAME checkpoint (batch ids continue
    // monotonically, so the store's version order stays intact)
    input.addData(rest.toIndexedSeq)
    val q2 = StreamingEntityResolution.attach(input.toDF(), store, ckpt)
    try q2.processAllAvailable()
    finally q2.stop()

    val streamed = entitySet(
      StreamingEntityResolution.entityTable(spark, store))
    val batch = entitySet(ExtendedQueries.q68EntityClusters(spark, sf))
    assert(batch.nonEmpty && streamed == batch)
  }
}
