package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Ttl
import graft.sinks.JdbcUpsert
import graft.streaming.OffsetTracker

/** TTL expiry, offset retention, and JDBC dialect generation. */
class TtlJdbcSpec extends SparkSpec {
  import spark.implicits._

  test("TTL: null lives forever, expired rows split off (event.py ttl_seconds)") {
    val now = 2000000000L // micros
    val df = Seq(
      ("live-no-ttl", 1000000000L, None),
      ("live-with-ttl", 1999000000L, Some(10L)),   // expires at +10s
      ("expired", 1000000000L, Some(1L))            // expired long ago
    ).toDF("id", "timestamp_micros", "ttl_seconds")
    val (live, dead) = Ttl.split(df, now)
    assert(live.select("id").as[String].collect().toSet ==
      Set("live-no-ttl", "live-with-ttl"))
    assert(dead.select("id").as[String].collect().toSeq == Seq("expired"))
  }

  test("offset retention drops stale audit rows (offset.py:199-226)") {
    val offsets = Seq(
      ("users", "ec", 0, "postgres", 100L, 5L),
      ("users", "ec", 1, "postgres", 900L, 7L))
      .toDF("table_name", "keyspace", "partition_id", "destination",
        "last_event_timestamp_micros", "events_replicated_count")
    val kept = OffsetTracker.retain(offsets, cutoffMicros = 500L)
    assert(kept.select("partition_id").as[Int].collect().toSeq == Seq(1))
  }

  test("JDBC dialect: upsert/delete/offset SQL matches reference shapes") {
    val schema = StructType(Seq(
      StructField("user_id", StringType), StructField("email", StringType),
      StructField("age", IntegerType)))
    assert(JdbcUpsert.upsertSql("users", schema, Seq("user_id")) ==
      "INSERT INTO users (user_id, email, age) VALUES (?, ?, ?) " +
        "ON CONFLICT (user_id) DO UPDATE SET email = EXCLUDED.email, age = EXCLUDED.age")
    // key-only table degrades to DO NOTHING (idempotent insert)
    val keysOnly = StructType(Seq(StructField("user_id", StringType)))
    assert(JdbcUpsert.upsertSql("t", keysOnly, Seq("user_id")).endsWith("DO NOTHING"))
    assert(JdbcUpsert.deleteSql("users", Seq("user_id")) ==
      "DELETE FROM users WHERE user_id = ?")
    val off = JdbcUpsert.offsetUpsertSql()
    assert(off.contains("ON CONFLICT (table_name, keyspace, partition_id, destination)"))
    // cumulative count semantics (postgres.py:178: count + EXCLUDED.count)
    assert(off.contains(
      "cdc_offsets.events_replicated_count + EXCLUDED.events_replicated_count"))
  }
}
