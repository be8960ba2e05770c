package graft

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets
import graft.streaming.{CdcPipeline, UpsertStateStore}
import graft.functions.MaskRules
import org.apache.spark.sql.functions._

/** End-to-end streaming slice (SURVEY §7.2): JSONL change events →
  * validate/mask/dedup → upsert state store, with kill/restart
  * exactly-once semantics mirroring
  * `tests/integration/test_exactly_once.py:16-168` and
  * `test_crash_recovery.py:16-208`. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventJson(id: String, typ: String, user: String, email: String,
      ts: Long): String =
    s"""{"event_id":"$id","event_type":"$typ","table_name":"users",""" +
      s""""keyspace":"ecommerce","partition_key":{"user_id":"$user"},""" +
      s""""clustering_key":{},"columns":${
        if (typ == "DELETE") "{}"
        else s"""{"email":"$email","age":"30"}"""},""" +
      s""""timestamp_micros":$ts,"captured_at_micros":$ts}"""

  private def writeFile(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  private def run(eventsDir: Path, base: Path): Unit = {
    val q = CdcPipeline.start(spark,
      eventsDir.toString, base.resolve("state").toString,
      base.resolve("ckpt").toString, base.resolve("dlq").toString)
    q.processAllAvailable()
    q.stop()
  }

  test("pipeline: mask, dedup, upsert, delete, DLQ, restart exactly-once") {
    val base = Files.createTempDirectory("cdc")
    val events = Files.createDirectories(base.resolve("events"))

    // batch 1: u1 insert, u2 insert, one duplicate redelivery of u1's
    // event (same natural key), one invalid event (no partition key)
    writeFile(events, "b1.json", Seq(
      eventJson("e1", "INSERT", "u1", "a@x.com", 1000),
      eventJson("e1-redelivered", "INSERT", "u1", "a@x.com", 1000),
      eventJson("e2", "INSERT", "u2", "b@x.com", 1000),
      """{"event_id":"bad","event_type":"INSERT","table_name":"users",
        |"keyspace":"ecommerce","partition_key":{},"clustering_key":{},
        |"columns":{},"timestamp_micros":5,"captured_at_micros":5}"""
        .stripMargin.replaceAll("\n", "")))
    run(events, base)

    val store = new UpsertStateStore(base.resolve("state").toString,
      Seq("event_key_cols"), Seq("timestamp_micros"))
    val s1 = store.current(spark).get.cache()
    assert(s1.count() == 2) // u1 deduped, bad row routed to DLQ
    val u1email = s1.filter(col("event_key_cols").contains("u1"))
      .select(element_at(col("columns"), "email")).as[String].head()
    // masked: sha256 of the PII email, not the raw value
    assert(u1email.length == 64 && u1email != "a@x.com")
    assert(spark.read.json(base.resolve("dlq").toString).count() == 1)

    // batch 2 after restart: update u1, delete u2, insert u3,
    // plus an exact redelivery of e2 from batch 1 (crash replay analog)
    writeFile(events, "b2.json", Seq(
      eventJson("e4", "UPDATE", "u1", "new@x.com", 2000),
      eventJson("e5", "DELETE", "u2", "", 2000),
      eventJson("e6", "INSERT", "u3", "c@x.com", 2000),
      eventJson("e2", "INSERT", "u2", "b@x.com", 1000)))
    run(events, base) // new query instance, same checkpoint → recovery path

    val s2 = store.current(spark).get.cache()
    val keys = s2.select("event_key_cols").as[String].collect()
    assert(keys.length == 2) // u2 deleted; u1 + u3 remain
    assert(keys.exists(_.contains("u1")) && keys.exists(_.contains("u3")))
    // u1 reflects the UPDATE (ts 2000), exactly once
    val u1 = s2.filter(col("event_key_cols").contains("u1"))
    assert(u1.select("timestamp_micros").as[Long].head() == 2000)

    // replaying the same upsert batch is a no-op (idempotent foreachBatch)
    val before = s2.collect().toSet
    val replay = s2.sparkSession.createDataFrame(s2.rdd, s2.schema)
    store.upsert(replay, batchId = 999)
    store.upsert(replay, batchId = 999) // committed marker short-circuits
    assert(store.current(spark).get.collect().toSet == before)
  }

  private def kvBatch(rows: (String, String, Long)*) =
    rows.toDF("k", "event_type", "ts")

  test("upsert store: a late event older than a DELETE cannot resurrect the row") {
    val dir = Files.createTempDirectory("graft-tomb").toString
    val store = new UpsertStateStore(dir, Seq("k"), Seq("ts"))
    store.upsert(kvBatch(("k1", "INSERT", 100L), ("k2", "INSERT", 100L)), 1)
    store.upsert(kvBatch(("k1", "DELETE", 300L)), 2)
    assert(store.current(spark).get.select("k").as[String].collect()
      .toSet == Set("k2"))
    // the late straggler: older than the delete, arriving after it
    store.upsert(kvBatch(("k1", "UPDATE", 200L)), 3)
    assert(store.current(spark).get.select("k").as[String].collect()
      .toSet == Set("k2"), "tombstone must outrank the older late event")
    // but a genuinely NEWER write revives the key (last-write-wins)
    store.upsert(kvBatch(("k1", "INSERT", 400L)), 4)
    assert(store.current(spark).get.select("k").as[String].collect()
      .toSet == Set("k1", "k2"))
  }

  test("upsert store: a null delete-marker column is LIVE, not dropped") {
    // a payload that lost the marker field round-tripping through the JSON
    // DLQ and was replayed into the store: `col =!= deleteValue` evaluates
    // to null on it, and a bare filter would silently drop the live row
    val dir = Files.createTempDirectory("graft-nulltomb").toString
    val store = new UpsertStateStore(dir, Seq("k"), Seq("ts"))
    val batch = Seq(
      ("k1", Some("INSERT"), 100L),
      ("k2", Option.empty[String], 100L), // marker lost in replay round-trip
      ("k3", Some("DELETE"), 100L)
    ).toDF("k", "event_type", "ts")
    store.upsert(batch, 1)
    assert(store.current(spark).get.select("k").as[String].collect()
      .toSet == Set("k1", "k2"), "null-marker row must survive the read")
  }

  test("upsert store: replay after a crash between pointer swap and marker") {
    val dir = Files.createTempDirectory("graft-crash")
    val store = new UpsertStateStore(dir.toString, Seq("k"), Seq("ts"))
    store.upsert(kvBatch(("k1", "INSERT", 100L)), 1)
    store.upsert(kvBatch(("k1", "UPDATE", 200L)), 2)
    val state = store.current(spark).get.collect().toSet
    // simulate the crash window: pointer already at v2, marker missing
    Files.delete(dir.resolve("_committed_2"))
    store.upsert(kvBatch(("k1", "UPDATE", 200L)), 2) // replay must be a no-op
    assert(store.current(spark).get.collect().toSet == state)
    assert(Files.exists(dir.resolve("_committed_2")), "marker backfilled")
  }

  test("upsert store: prunes versions older than the previous batch") {
    val dir = Files.createTempDirectory("graft-prune")
    val store = new UpsertStateStore(dir.toString, Seq("k"), Seq("ts"))
    (1L to 5L).foreach(b => store.upsert(kvBatch(("k1", "INSERT", b * 100)), b))
    val names = Files.list(dir).map[String](_.getFileName.toString)
      .toArray.map(_.toString).toSet
    assert(!names.exists(n => n == "v1" || n == "v2" || n == "v3"))
    assert(names.contains("v4") && names.contains("v5"))
    assert(store.current(spark).get.select("ts").as[Long].head() == 500L)
  }

  test("maskEnvelope compiles with an empty PHI or PII field list") {
    val rules = graft.functions.MaskRules(
      piiFields = Seq("email"), phiFields = Nil)
    val df = Seq(("e1", Map("email" -> "a@x.com", "age" -> "30")))
      .toDF("event_id", "columns")
    val out = CdcPipeline.maskEnvelope(rules)(df)
      .select(element_at(col("columns"), "email"),
        element_at(col("columns"), "age"))
      .as[(String, String)].head()
    assert(out._1.length == 64) // sha2 applied
    assert(out._2 == "30")      // passthrough untouched
  }

  test("schema evolution through the live pipeline: ADD_COLUMN generations + incompatibles DLQ") {
    // the reference's test_add_column/test_alter_type shape run end-to-end:
    // deliver a generation-1 batch, register an ADD_COLUMN version at the
    // restart boundary (SURVEY §7.6 restart-on-schema-change), deliver
    // generation-2 events, and assert both generations land typed while
    // events carrying unsupported-typed columns route to the DLQ
    import graft.schema._
    import graft.types.CqlTypes
    import graft.streaming.FanOut
    import graft.sinks.DlqSink
    val base = Files.createTempDirectory("cdc-evo")
    val events = Files.createDirectories(base.resolve("events"))
    val typedOut = base.resolve("typed").toString
    val dlqDir = base.resolve("dlq").toString
    val registry = new SchemaRegistry

    // typed-warehouse destination: per batch, project against the
    // registry's LATEST schema; unsupported-typed columns → DLQ
    def typedWrite(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val v = registry.latest("ecommerce", "users").get
      val (ok, bad) = SchemaEvolution.gateUnsupported(df, v.schema)
      if (!bad.isEmpty)
        DlqSink.write(bad, dlqDir, "typed-warehouse", "UnsupportedType",
          "column with DLQ-routed CQL type", failedAtMicros = 1L)
      val typedSchema = org.apache.spark.sql.types.StructType(v.schema.fields
        .filterNot(f => CqlTypes.isUnsupported(SchemaMeta.cqlTypeOf(f))))
      SchemaEvolution.applyTyped(ok, typedSchema)
        .write.mode("append").parquet(s"$typedOut/gen=${v.version}")
    }
    def runEvo(): Unit = {
      val q = CdcPipeline.start(spark, events.toString,
        base.resolve("state").toString, base.resolve("ckpt").toString,
        dlqDir, extraSinks = Seq(
          FanOut.Destination("typed-warehouse", write = typedWrite)))
      q.processAllAvailable()
      q.stop()
    }

    // generation 1: (user_id PK, email)
    val v1 = org.apache.spark.sql.types.StructType(Seq(
      SchemaMeta.field("user_id", "TEXT", partitionKey = true),
      SchemaMeta.field("email", "TEXT")))
    assert(SchemaEvolution.evolve(registry, "ecommerce", "users", v1)
      == SchemaEvolution.Discovered(1))
    writeFile(events, "g1.json",
      Seq(eventJson("e1", "INSERT", "u1", "a@x.com", 1000)))
    runEvo()

    // restart boundary: ADD_COLUMN phone (compatible, applied) + a legacy
    // COUNTER column (lands in the registry, but its events DLQ-route);
    // an ALTER narrowing email to INT is REJECTED, never applied
    val v2 = org.apache.spark.sql.types.StructType(v1.fields ++ Seq(
      SchemaMeta.field("phone", "TEXT"),
      SchemaMeta.field("legacy_ctr", "COUNTER")))
    SchemaEvolution.evolve(registry, "ecommerce", "users", v2) match {
      case SchemaEvolution.Applied(2, changes) =>
        assert(changes.collect { case AddColumn(c, _) => c }.toSet
          == Set("phone", "legacy_ctr"))
      case other => fail(s"expected Applied(2, _), got $other")
    }
    val narrowed = org.apache.spark.sql.types.StructType(Seq(
      SchemaMeta.field("user_id", "TEXT", partitionKey = true),
      SchemaMeta.field("email", "INT"),
      SchemaMeta.field("phone", "TEXT"),
      SchemaMeta.field("legacy_ctr", "COUNTER")))
    assert(SchemaEvolution.evolve(registry, "ecommerce", "users", narrowed)
      .isInstanceOf[SchemaEvolution.Rejected])

    // generation 2: e2 uses the new phone column; e3 carries the
    // unsupported-typed legacy_ctr and must DLQ-route
    writeFile(events, "g2.json", Seq(
      s"""{"event_id":"e2","event_type":"INSERT","table_name":"users",""" +
        s""""keyspace":"ecommerce","partition_key":{"user_id":"u2"},""" +
        s""""clustering_key":{},"columns":{"email":"b@x.com","phone":"555"},""" +
        s""""timestamp_micros":2000,"captured_at_micros":2000}""",
      s"""{"event_id":"e3","event_type":"INSERT","table_name":"users",""" +
        s""""keyspace":"ecommerce","partition_key":{"user_id":"u3"},""" +
        s""""clustering_key":{},"columns":{"email":"c@x.com","legacy_ctr":"7"},""" +
        s""""timestamp_micros":2000,"captured_at_micros":2000}"""))
    runEvo() // fresh query, same checkpoint — the §7.6 restart

    // both generations landed typed, each under its own schema version
    val g1 = spark.read.parquet(s"$typedOut/gen=1")
    assert(g1.columns.toSeq ==
      Seq("event_id", "event_type", "timestamp_micros", "user_id", "email"))
    assert(g1.select("user_id").as[String].collect().toSeq == Seq("u1"))
    val g2 = spark.read.parquet(s"$typedOut/gen=2")
    assert(g2.columns.contains("phone"))
    assert(g2.select("user_id").as[String].collect().toSeq == Seq("u2"))
    // the evolved column is PII — masking applies to it from its first
    // post-evolution batch (sha-256, not the raw phone number)
    val phone = g2.select("phone").as[String].head()
    assert(phone.length == 64 && phone != "555")
    // the unsupported-typed event went to the DLQ, not the warehouse
    assert(DlqSink.count(spark, dlqDir, "typed-warehouse") == 1)
    // the state store (schema-generation-agnostic) holds all three users
    val store = new UpsertStateStore(base.resolve("state").toString,
      Seq("event_key_cols"), Seq("timestamp_micros"))
    assert(store.current(spark).get.count() == 3)
    // registry history records the lineage: v1 → v2, hashes distinct
    val hist = registry.history("ecommerce", "users")
    assert(hist.map(_.version) == List(1, 2))
    assert(hist.map(_.hash).distinct.size == 2)
  }

  test("restart on schema change: events arriving in the kill window " +
      "survive the version flip exactly-once, old state widens") {
    // SURVEY §7.6's operational sequence, end-to-end: the stream is
    // KILLED, generation-2 events (new column + a value needing the
    // widened type) land while nothing is running, the registry flips
    // v1→v2 (ADD_COLUMN phone + ALTER age INT→BIGINT, the
    // test_add_column/test_alter_type pair), and the restart drains the
    // backlog from the checkpoint — every event lands exactly once, a
    // generation-1 row UPDATED post-flip carries the new column, and a
    // further no-input restart replays nothing
    import graft.schema._
    import graft.streaming.FanOut
    val base = Files.createTempDirectory("cdc-flip")
    val events = Files.createDirectories(base.resolve("events"))
    val typedOut = base.resolve("typed").toString
    val registry = new SchemaRegistry

    def typedWrite(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val v = registry.latest("ecommerce", "users").get
      SchemaEvolution.applyTyped(df, v.schema)
        .write.mode("append").parquet(s"$typedOut/gen=${v.version}")
    }
    def drain(): Unit = {
      val q = CdcPipeline.start(spark, events.toString,
        base.resolve("state").toString, base.resolve("ckpt").toString,
        base.resolve("dlq").toString, extraSinks = Seq(
          FanOut.Destination("typed-warehouse", write = typedWrite)))
      q.processAllAvailable()
      q.stop()
    }
    def userJson(id: String, typ: String, user: String, ts: Long,
        cols: String): String =
      s"""{"event_id":"$id","event_type":"$typ","table_name":"users",""" +
        s""""keyspace":"ecommerce","partition_key":{"user_id":"$user"},""" +
        s""""clustering_key":{},"columns":$cols,""" +
        s""""timestamp_micros":$ts,"captured_at_micros":$ts}"""

    // generation 1 under v1 (age is INT)
    val v1 = org.apache.spark.sql.types.StructType(Seq(
      SchemaMeta.field("user_id", "TEXT", partitionKey = true),
      SchemaMeta.field("email", "TEXT"),
      SchemaMeta.field("age", "INT")))
    assert(SchemaEvolution.evolve(registry, "ecommerce", "users", v1)
      == SchemaEvolution.Discovered(1))
    writeFile(events, "g1.json", Seq(
      userJson("e1", "INSERT", "u1", 1000, """{"email":"a@x.com","age":"30"}"""),
      userJson("e2", "INSERT", "u2", 1000, """{"email":"b@x.com","age":"40"}""")))
    drain() // ...and the stream is now KILLED

    // the kill window: generation-2 events land while nothing runs —
    // an UPDATE to a generation-1 user using the NEW column, and an
    // insert whose age value needs the WIDENED type
    writeFile(events, "g2.json", Seq(
      userJson("e3", "UPDATE", "u1", 2000, """{"phone":"555","age":"31"}"""),
      userJson("e4", "INSERT", "u3", 2000,
        """{"email":"c@x.com","phone":"777","age":"9999999999"}""")))
    // the registry flip that motivated the restart
    val v2 = org.apache.spark.sql.types.StructType(Seq(
      SchemaMeta.field("user_id", "TEXT", partitionKey = true),
      SchemaMeta.field("email", "TEXT"),
      SchemaMeta.field("age", "BIGINT"),
      SchemaMeta.field("phone", "TEXT")))
    SchemaEvolution.evolve(registry, "ecommerce", "users", v2) match {
      case SchemaEvolution.Applied(2, changes) =>
        assert(changes.toSet == Set(AddColumn("phone", "TEXT"),
          AlterType("age", "INT", "BIGINT", keyRole = false)))
      case other => fail(s"expected Applied(2, _), got $other")
    }
    drain() // restart from the same checkpoint drains the backlog

    val store = new UpsertStateStore(base.resolve("state").toString,
      Seq("event_key_cols"), Seq("timestamp_micros"))
    def stateSnapshot() = store.current(spark).get
      .select(col("event_key_cols"),
        element_at(col("columns"), "phone").as("phone"),
        element_at(col("columns"), "age").as("age"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    val s1 = stateSnapshot()
    assert(s1.size == 3, s"expected u1,u2,u3 — got $s1") // no loss, no dup
    // the generation-1 row took the post-flip UPDATE: new column present
    // (masked — phone is PII from its first post-evolution batch)
    val u1 = s1.find(_._1.contains("u1")).get
    assert(u1._2 != null && u1._2.length == 64 && u1._2 != "555")
    assert(u1._3 == "31")
    // typed landings: gen-1 has INT age, gen-2 has the widened BIGINT
    // carrying the value an INT cannot hold
    val g1 = spark.read.parquet(s"$typedOut/gen=1")
    assert(g1.schema("age").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(g1.count() == 2)
    val g2 = spark.read.parquet(s"$typedOut/gen=2")
    assert(g2.schema("age").dataType == org.apache.spark.sql.types.LongType)
    assert(g2.select("age").as[Long].collect().toSet ==
      Set(31L, 9999999999L))
    // a further restart with NO new input replays nothing
    drain()
    assert(stateSnapshot() == s1)
    assert(spark.read.parquet(s"$typedOut/gen=2").count() == g2.count())
    assert(registry.history("ecommerce", "users").map(_.version) ==
      List(1, 2))
  }
}
