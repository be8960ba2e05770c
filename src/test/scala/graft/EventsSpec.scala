package graft

import org.apache.spark.sql.functions._
import graft.events.ChangeEvent
import graft.ops.LatestState

/** ChangeEvent envelope, validation, event-key dedup, and latest-state
  * semantics (reference `src/models/event.py`, `src/transform/validator.py`,
  * SURVEY §2.5). */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: String, typ: String, pk: Map[String, String],
      cols: Map[String, String], ts: Long) =
    ChangeEvent(id, typ, "users", "ecommerce", pk, Map.empty, cols, ts, None, ts)

  test("eventKey canonical form (event.py:124-129) and column parity") {
    val e = ev("e1", "INSERT", Map("user_id" -> "u1"), Map("email" -> "a@b.c"), 1000)
    assert(e.eventKey == "ecommerce.users:user_id=u1::1000")

    val df = Seq(e).toDS().toDF()
    val viaCol = df.select(ChangeEvent.eventKeyCol).as[String].head()
    assert(viaCol == e.eventKey) // scala and Catalyst forms agree
  }

  test("eventKeyCol renders a NULL clustering_key as an empty slot") {
    // a null map must not collapse "ks.t:pk::ts" into "ks.t:pk:ts" —
    // concat_ws skips nulls, which would let distinct keys collide
    val df = Seq(("ecommerce", "users", 1000L))
      .toDF("keyspace", "table_name", "timestamp_micros")
      .withColumn("partition_key", map(lit("user_id"), lit("u1")))
      .withColumn("clustering_key",
        lit(null).cast("map<string,string>"))
    val key = df.select(ChangeEvent.eventKeyCol).as[String].head()
    assert(key == "ecommerce.users:user_id=u1::1000")
  }

  test("delimiter characters in key values cannot collide distinct keys") {
    // {u -> "a:v=1"} vs {u -> "a", v -> "1"} rendered unescaped would both
    // be "...:u=a:v=1..." — structurally different rows merged silently
    val a = ev("e1", "INSERT", Map("u" -> "a:v=1"), Map.empty, 1000)
    val b = ev("e2", "INSERT", Map("u" -> "a", "v" -> "1"), Map.empty, 1000)
    assert(a.eventKey != b.eventKey)
    // and {a -> "1,b=2"} vs {a -> "1", b -> "2"}
    val c = ev("e3", "INSERT", Map("a" -> "1,b=2"), Map.empty, 1000)
    val d = ev("e4", "INSERT", Map("a" -> "1", "b" -> "2"), Map.empty, 1000)
    assert(c.eventKey != d.eventKey)
    // Catalyst column stays in parity on the escaped forms
    val df = Seq(a, c).toDS().toDF()
    val viaCol = df.select(ChangeEvent.eventKeyCol).as[String].collect().toSet
    assert(viaCol == Set(a.eventKey, c.eventKey))
  }

  test("JSON envelope round-trips through from_json") {
    val json = """{"event_id":"e1","event_type":"INSERT","table_name":"users",
      "keyspace":"ecommerce","partition_key":{"user_id":"u1"},
      "clustering_key":{},"columns":{"email":"a@b.c","age":"30"},
      "timestamp_micros":1000,"captured_at_micros":2000}""".replaceAll("\n\\s*", "")
    val parsed = ChangeEvent.parseEnvelope(Seq(json).toDF("value"))
    val row = parsed.as[ChangeEvent].head()
    assert(row.event_id == "e1" && row.columns("age") == "30" &&
      row.ttl_seconds.isEmpty)
  }

  test("validation splits invalid events with reasons (validator.py:66-106)") {
    val good = ev("e1", "INSERT", Map("user_id" -> "u1"), Map("a" -> "1"), 1)
    val badType = ev("e2", "UPSERT", Map("user_id" -> "u2"), Map.empty, 2)
    val noPk = ev("e3", "INSERT", Map.empty, Map.empty, 3)
    val delWithCols = ev("e4", "DELETE", Map("user_id" -> "u4"), Map("a" -> "1"), 4)
    val okDelete = ev("e5", "DELETE", Map("user_id" -> "u5"), Map.empty, 5)

    val (valid, invalid) = ChangeEvent.validate(
      Seq(good, badType, noPk, delWithCols, okDelete).toDS().toDF())
    assert(valid.select("event_id").as[String].collect().toSet == Set("e1", "e5"))
    val reasons = invalid.select("event_id", "_invalid_reason")
      .as[(String, String)].collect().toMap
    assert(reasons("e2") == "unknown event_type")
    assert(reasons("e3") == "empty partition_key")
    assert(reasons("e4") == "DELETE with columns")
  }

  test("dropDuplicates on eventKey is exactly-once-per-event (§2.5)") {
    val e = ev("e1", "INSERT", Map("user_id" -> "u1"), Map("a" -> "1"), 1000)
    val dup = e.copy(event_id = "e1-redelivered") // same natural key
    val df = Seq(e, dup).toDS().toDF()
      .withColumn("event_key", ChangeEvent.eventKeyCol)
    assert(df.dropDuplicates("event_key").count() == 1)
  }

  test("latest-state materialization + delete propagation (§2.5)") {
    val rows = Seq(
      ("u1", "INSERT", 1L, "v1"), ("u1", "UPDATE", 3L, "v3"),
      ("u1", "UPDATE", 2L, "v2"),
      ("u2", "INSERT", 1L, "x1"), ("u2", "DELETE", 9L, null),
      ("u3", "INSERT", 5L, "y1")
    ).toDF("user_id", "event_type", "ts", "val")

    val latest = LatestState.materialize(rows,
      keys = Seq(col("user_id")), order = Seq(col("ts")),
      isDelete = col("event_type") === "DELETE")
    val got = latest.select("user_id", "val").as[(String, String)]
      .collect().toMap
    assert(got == Map("u1" -> "v3", "u3" -> "y1")) // u2's final event is DELETE

    val markers = rows.filter($"event_type" === "DELETE")
    val after = LatestState.propagateDeletes(
      LatestState.latestPerKey(rows, Seq(col("user_id")), Seq(col("ts"))),
      markers, Seq("user_id"))
    assert(after.select("user_id").as[String].collect().toSet == Set("u1", "u3"))
  }
}
