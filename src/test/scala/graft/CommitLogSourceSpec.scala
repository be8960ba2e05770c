package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.events.ChangeEvent
import graft.sources.{CommitLogFormat, CommitLogOffset}

/** DSv2 framed-binary commitlog source: framing, file ordering, offset
  * resume, partial-entry tolerance (reference src/cdc/reader.py semantics).
  */
class CommitLogSourceSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(i: Int, op: String): String =
    s"""{"event_id":"e$i","event_type":"$op","table_name":"users",
       |"keyspace":"ecommerce","partition_key":{"user_id":"$i"},
       |"clustering_key":{},"columns":{"email":"u$i@example.com"},
       |"timestamp_micros":$i,"captured_at_micros":$i}"""
      .stripMargin.replaceAll("\n", "")

  private def append(f: File, entries: Seq[(Char, String)],
      garbageTail: Boolean = false): Unit = {
    val out = new FileOutputStream(f, true)
    try {
      entries.foreach { case (op, json) =>
        out.write(CommitLogFormat.frame(op, json))
      }
      if (garbageTail) // length prefix promising 100 bytes, only 3 present
        out.write(Array[Byte](0, 0, 0, 100, 1, 2, 3))
    } finally out.close()
  }

  test("offset json round-trips") {
    val o = CommitLogOffset("CommitLog-7.log", 12345L)
    assert(CommitLogOffset.fromJson(o.json()) == o)
    assert(CommitLogOffset.fromJson(CommitLogOffset.Initial.json())
      == CommitLogOffset.Initial)
    // names with JSON metacharacters survive the checkpoint round-trip
    val weird = CommitLogOffset("""CommitLog-"x"\y.log""", 7L)
    assert(CommitLogOffset.fromJson(weird.json()) == weird)
  }

  test("file ordering is numeric-aware (unpadded segment ids)") {
    import CommitLogFormat.fileCompare
    assert(fileCompare("CommitLog-9.log", "CommitLog-10.log") < 0)
    assert(fileCompare("CommitLog-10.log", "CommitLog-9.log") > 0)
    assert(fileCompare("CommitLog-2.log", "CommitLog-2.log") == 0)
    assert(fileCompare("CommitLog-1-99.log", "CommitLog-1-100.log") < 0)
    val sorted = Seq("CommitLog-10.log", "CommitLog-2.log", "CommitLog-1.log")
      .sorted(CommitLogFormat.fileOrdering)
    assert(sorted == Seq("CommitLog-1.log", "CommitLog-2.log", "CommitLog-10.log"))
  }

  test("reads framed entries across files, skips partial tails, resumes at offset") {
    val dir = Files.createTempDirectory("graft-clog").toFile
    val ckpt = Files.createTempDirectory("graft-clog-ckpt").toString
    val f1 = new File(dir, "CommitLog-001.log")
    val f2 = new File(dir, "CommitLog-002.log")
    append(f1, Seq(('I', envelope(1, "INSERT")), ('U', envelope(2, "UPDATE")),
      ('D', envelope(3, "DELETE"))), garbageTail = true)
    append(f2, Seq(('I', envelope(4, "INSERT")), ('I', envelope(5, "INSERT"))))

    val q = spark.readStream.format("graft-commitlog")
      .option("path", dir.getPath).load()
      .writeStream.format("memory").queryName("clog")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("clog")
        .select("event_type", "commitlog_file", "position").collect()
      assert(got.length == 5) // partial tail of f1 excluded
      assert(got.count(_.getString(0) == "INSERT") == 3)
      assert(got.count(_.getString(0) == "UPDATE") == 1)
      assert(got.count(_.getString(0) == "DELETE") == 1)
      // positions are frame starts, strictly increasing per file
      val posF2 = got.filter(_.getString(1) == "CommitLog-002.log").map(_.getLong(2))
      assert(posF2.sorted.toSeq == posF2.toSeq && posF2.head == 0L)

      // new entries appended to the newest file arrive incrementally,
      // exactly once (no re-read of the first five)
      append(f2, Seq(('U', envelope(6, "UPDATE"))))
      q.processAllAvailable()
      assert(spark.table("clog").count() == 6)

      // the typed envelope parses straight off the body column
      val parsed = ChangeEvent.parseEnvelope(spark.table("clog"), "body")
        .where($"event_id" === "e6").collect()
      assert(parsed.length == 1)
      assert(parsed.head.getAs[Map[String, String]]("columns")("email") == "u6@example.com")
    } finally q.stop()
  }

  test("maxEntriesPerTrigger rate-limits admission without losing entries") {
    val dir = Files.createTempDirectory("graft-clog3").toFile
    val ckpt = Files.createTempDirectory("graft-clog3-ckpt").toString
    append(new File(dir, "CommitLog-001.log"),
      (1 to 5).map(i => ('I', envelope(i, "INSERT"))))

    val q = spark.readStream.format("graft-commitlog")
      .option("path", dir.getPath)
      .option("maxEntriesPerTrigger", 2)
      .load()
      .writeStream.format("memory").queryName("clog_rate")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("clog_rate").count() == 5)
      val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.length >= 3, // 2+2+1, never more than the cap
        s"expected ≥3 rate-limited batches, got ${batchSizes.mkString(",")}")
      assert(batchSizes.forall(_ <= 2))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains what existed at start, then stops") {
    val dir = Files.createTempDirectory("graft-clog4").toFile
    val ckpt = Files.createTempDirectory("graft-clog4-ckpt").toString
    val f = new File(dir, "CommitLog-001.log")
    append(f, (1 to 6).map(i => ('I', envelope(i, "INSERT"))))

    val q = spark.readStream.format("graft-commitlog")
      .option("path", dir.getPath)
      .option("maxEntriesPerTrigger", 4) // drains in 2 capped batches
      .load()
      .writeStream.format("memory").queryName("clog_avnow")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query must self-stop")
      assert(spark.table("clog_avnow").count() == 6)
    } finally q.stop()
  }

  test("restart from checkpoint does not duplicate") {
    val dir = Files.createTempDirectory("graft-clog2").toFile
    val ckpt = Files.createTempDirectory("graft-clog2-ckpt").toString
    val out = Files.createTempDirectory("graft-clog2-out").toString
    val f = new File(dir, "CommitLog-001.log")
    append(f, (1 to 4).map(i => ('I', envelope(i, "INSERT"))))

    def run(): Unit = {
      val q = spark.readStream.format("graft-commitlog")
        .option("path", dir.getPath).load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 4)
    append(f, Seq(('D', envelope(5, "DELETE"))))
    run() // fresh query instance, same checkpoint → resumes mid-file
    val rows = spark.read.parquet(out).select("event_type", "position").collect()
    assert(rows.length == 5, "restart must append only the delta")
    assert(rows.count(_.getString(0) == "DELETE") == 1)
  }

  test("full CDC pipeline ingests from commitlog segments end-to-end") {
    // the stream_eps_commitlog bench path: framed-binary source → envelope
    // parse → mask → watermark dedup → upsert state store
    val base = Files.createTempDirectory("graft-clog-e2e")
    val logs = Files.createDirectories(base.resolve("commitlog"))
    graft.streaming.ThroughputBench.generateCommitlog(
      logs, nEvents = 200, nFiles = 2, nUsers = 20)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", 4)
    try {
      val raw = spark.readStream.format("graft-commitlog")
        .option("path", logs.toString)
        .load()
        .transform(df => ChangeEvent.parseEnvelope(df, "body"))
      val q = graft.streaming.CdcPipeline.startFromRaw(spark, raw,
        base.resolve("state").toString, base.resolve("ckpt").toString,
        base.resolve("dlq").toString)
      try q.processAllAvailable() finally q.stop()
      val state = graft.streaming.CdcPipeline
        .currentState(spark, base.resolve("state").toString)
      assert(state.isDefined, "state store must materialize")
      // 20 users; ids ≡9 mod 10 are DELETEs — every user's LATEST event
      // (ids 180..199) decides: users 9 and 19 end deleted, 18 survive
      assert(state.get.count() == 18)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
