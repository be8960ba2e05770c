package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for stateful streaming at scale.
  *
  * The default HDFS-backed provider keeps every key of every stateful
  * operator as JVM objects on-heap. For the 100 TB north star —
  * `dropDuplicatesWithinWatermark` over billions of event keys, streaming
  * aggregations over high-cardinality groups (SURVEY §7.6 "streaming state
  * size") — that heap residency is the first thing to fall over. RocksDB
  * keeps state off-heap on local SSD with a bounded block cache, and
  * changelog checkpointing uploads per-batch deltas instead of full
  * snapshots, so checkpoint cost is O(changed keys), not O(state).
  *
  * Replaces the reference's unbounded in-memory offset/state dicts
  * (`src/cdc/offset.py:27`) with a spillable, restart-safe store.
  */
object StateStores {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Time mode matching a TTL choice: Spark REJECTS a non-NONE
    * `TTLConfig` outside ProcessingTime time mode
    * (`validateTTLConfig` throws at state-variable registration), so
    * every TTL-parameterized processor here derives its mode from the
    * ttl instead of hardcoding `TimeMode.None()`. */
  def timeModeFor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      : org.apache.spark.sql.streaming.TimeMode =
    if (ttl == org.apache.spark.sql.streaming.TTLConfig.NONE)
      org.apache.spark.sql.streaming.TimeMode.None()
    else org.apache.spark.sql.streaming.TimeMode.ProcessingTime()

  /** Switch this session's stateful operators to RocksDB. Takes effect for
    * queries STARTED after the call (provider is pinned per-query into the
    * checkpoint at first start). `boundedMemMb` caps total RocksDB memory
    * usage across all state store instances on an executor.
    */
  def useRocksDb(spark: SparkSession, boundedMemMb: Long = 1024): Unit = {
    val c = spark.conf
    c.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    // delta-upload checkpointing: per-batch cost ∝ keys touched that batch
    c.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    // single memory budget shared by all stores on the executor, instead
    // of per-store block caches that multiply by #partitions × #operators
    c.set("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
    c.set("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", boundedMemMb.toString)
  }

  /** Revert to the default provider (new queries only). */
  def useDefault(spark: SparkSession): Unit = {
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage")
    spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB")
  }
}
