package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Replication-progress tracking as a custom stateful streaming operator.
  *
  * The reference models progress as `ReplicationOffset` rows keyed by
  * (table, keyspace, partition_id, destination) with a monotonic
  * last-event-timestamp guard and a cumulative replicated count
  * (`src/models/offset.py:20-167`, monotonicity at `offset.py:132-134`,
  * count accumulation at `offset.py:146`). Spark owns actual recovery via
  * the checkpoint (SURVEY §1.1 row 2); this operator reproduces the
  * *auditable artifact* as a `mapGroupsWithState` stream so downstream
  * lag/monitoring queries (§2.4) keep working. State per key is O(1) —
  * safe at any key cardinality with the RocksDB state store.
  */
object OffsetTracker {

  case class OffsetKey(keyspace: String, table_name: String,
      partition_id: Int, destination: String)

  case class OffsetUpdate(key: OffsetKey, timestamp_micros: Long, events: Long)

  case class ReplicationOffset(
      keyspace: String, table_name: String, partition_id: Int,
      destination: String, last_event_timestamp_micros: Long,
      events_replicated_count: Long)

  /** Fold updates into per-key offsets. Regressions in event time are
    * ignored (monotonicity guard, `offset.py:132-134`); counts accumulate. */
  def update(key: OffsetKey, rows: Iterator[OffsetUpdate],
      state: GroupState[ReplicationOffset]): ReplicationOffset = {
    val prior = state.getOption.getOrElse(
      ReplicationOffset(key.keyspace, key.table_name, key.partition_id,
        key.destination, Long.MinValue, 0L))
    val next = rows.foldLeft(prior) { (acc, r) =>
      acc.copy(
        last_event_timestamp_micros =
          math.max(acc.last_event_timestamp_micros, r.timestamp_micros),
        events_replicated_count = acc.events_replicated_count + r.events)
    }
    state.update(next)
    next
  }

  /** Wire the operator over a stream of updates. */
  def track(updates: Dataset[OffsetUpdate]): Dataset[ReplicationOffset] = {
    implicit val keyEnc = Encoders.product[OffsetKey]
    implicit val offEnc = Encoders.product[ReplicationOffset]
    updates.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  /** Current replication lag in micros vs a reference "now" — clamped ≥ 0
    * (`src/cdc/offset.py:271-290`). */
  def lagMicros(offset: ReplicationOffset, nowMicros: Long): Long =
    math.max(0L, nowMicros - offset.last_event_timestamp_micros)

  /** Retention sweep over the audit offset table: drop offsets not updated
    * since the cutoff (`src/cdc/offset.py:199-226`, default 7 days). The
    * real recovery state lives in the checkpoint with its own native
    * retention; this prunes only the observable artifact. */
  def retain(offsets: org.apache.spark.sql.DataFrame,
      cutoffMicros: Long): org.apache.spark.sql.DataFrame =
    offsets.filter(
      org.apache.spark.sql.functions.col("last_event_timestamp_micros") >= cutoffMicros)
}
