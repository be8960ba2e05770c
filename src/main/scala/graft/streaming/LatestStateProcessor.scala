package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Last-write-wins CDC materialization on Spark 4's `transformWithState`
  * arbitrary-state API — the in-stream equivalent of
  * [[UpsertStateStore]]'s per-batch MERGE (reference semantics: highest
  * `timestamp_micros` wins; DELETE clears the key; SURVEY §2.5).
  *
  * Per key, a single `ValueState` holds the winning (timestamp, payload);
  * each micro-batch emits the key's post-batch state (tombstones emit with
  * `deleted = true`, letting downstream sinks propagate deletes). State is
  * optionally TTL'd — the reference's offset-retention idea applied to
  * row state: keys silent longer than the TTL are evicted by the store
  * itself, which is what bounds state on a 100-TB keyspace where most
  * keys go cold.
  */
object LatestStateProcessor {

  /** Incoming change event (already validated/masked upstream). */
  final case class Change(key: String, op: String, ts: Long, payload: String)

  /** Post-batch state of a key. */
  final case class KeyState(key: String, ts: Long, payload: String,
      deleted: Boolean)

  // `private[streaming]`, not `private`: a Scala-private nested class gets
  // no public JVM access flag, and the state encoder's generated code then
  // cannot resolve `Stored.ts()` — every state (de)serialization silently
  // falls back to interpreted projection in the streaming hot path.
  private[streaming] final case class Stored(ts: Long, payload: String,
      deleted: Boolean)

  class Processor(ttl: TTLConfig)
      extends StatefulProcessor[String, Change, KeyState] {
    @transient private var state: ValueState[Stored] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Stored]("latest",
        Encoders.product[Stored], ttl)

    override def handleInputRows(key: String, rows: Iterator[Change],
        timerValues: TimerValues): Iterator[KeyState] = {
      val prev = if (state.exists()) Some(state.get()) else None
      // fold this batch's events: highest ts wins; ties → DELETE wins
      // (reference tombstone rule), matching UpsertStateStore's MERGE
      val winner = rows.foldLeft(prev.getOrElse(Stored(Long.MinValue, null, deleted = false))) {
        (acc, c) =>
          val isDel = c.op == "DELETE"
          if (c.ts > acc.ts || (c.ts == acc.ts && isDel && !acc.deleted))
            Stored(c.ts, if (isDel) null else c.payload, isDel)
          else acc
      }
      state.update(winner)
      Iterator.single(KeyState(key, winner.ts, winner.payload, winner.deleted))
    }
  }

  /** Wire a change stream through the processor (update-mode output).
    * Requires the RocksDB state-store provider
    * ([[StateStores.useRocksDb]]) — transformWithState state lives in
    * column families, which the default HDFS-backed provider lacks. */
  def latestState(changes: Dataset[Change],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[KeyState] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .transformWithState(new Processor(ttl), StateStores.timeModeFor(ttl),
        OutputMode.Update())
  }
}
