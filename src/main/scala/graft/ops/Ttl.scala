package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TTL expiry — Cassandra rows carry an optional TTL that the reference
  * threads through every event (`src/models/event.py:21-129` field
  * `ttl_seconds`, parsed at `src/cdc/parser.py:99-102`) but never
  * enforces; destination warehouses have no TTL concept. The engine
  * enforces it relationally: a row is live iff it has no TTL or
  * `writetime + ttl` is still in the future. Plain column predicate →
  * pushes into scans, vectorizes, and works identically in batch and
  * streaming plans. */
object Ttl {

  /** Liveness predicate (micros-domain integer math, no timezone). */
  def isLive(nowMicros: Long, tsCol: Column = col("timestamp_micros"),
      ttlCol: Column = col("ttl_seconds")): Column =
    ttlCol.isNull || (tsCol + ttlCol * lit(1000000L)) > lit(nowMicros)

  /** Drop expired rows. */
  def expire(df: DataFrame, nowMicros: Long): DataFrame =
    df.filter(isLive(nowMicros))

  /** Split (live, expired) — expired rows feed retention auditing. */
  def split(df: DataFrame, nowMicros: Long): (DataFrame, DataFrame) =
    (df.filter(isLive(nowMicros)), df.filter(!isLive(nowMicros)))
}
