package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the CDC streaming slice: writes change
  * events as JSONL, streams them through validate → mask → dedup →
  * upsert, restarts the query from its checkpoint with late + duplicate
  * events, and prints the materialized latest state.
  *
  * Usage: `sbt "runMain graft.streaming.PipelineDemo"` (work dir defaults
  * to a temp directory; pass one argument to choose it).
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cdc-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base: Path =
      if (args.nonEmpty) Files.createDirectories(java.nio.file.Paths.get(args(0)))
      else Files.createTempDirectory("cdc-demo")
    val events = Files.createDirectories(base.resolve("events"))
    def ev(id: String, typ: String, user: String, email: String, ts: Long) =
      s"""{"event_id":"$id","event_type":"$typ","table_name":"users",""" +
        s""""keyspace":"ecommerce","partition_key":{"user_id":"$user"},""" +
        s""""clustering_key":{},"columns":${
          if (typ == "DELETE") "{}" else s"""{"email":"$email","age":"30"}"""},""" +
        s""""timestamp_micros":$ts,"captured_at_micros":$ts}"""

    def runOnce(): Unit = {
      val q = CdcPipeline.start(spark, events.toString,
        base.resolve("state").toString, base.resolve("ckpt").toString,
        base.resolve("dlq").toString)
      q.processAllAvailable(); q.stop()
    }

    Files.write(events.resolve("b1.json"), Seq(
      ev("e1", "INSERT", "u1", "alice@example.com", 1000),
      ev("e1-dup", "INSERT", "u1", "alice@example.com", 1000),
      ev("e2", "INSERT", "u2", "bob@example.com", 1000)
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    runOnce()
    println(s"--- state after batch 1 (u1 dedup'd, emails masked):")
    CdcPipeline.currentState(spark, base.resolve("state").toString)
      .foreach(_.show(false))

    Files.write(events.resolve("b2.json"), Seq(
      ev("e3", "UPDATE", "u1", "alice@new.example", 2000),
      ev("e4", "DELETE", "u2", "", 2000),
      ev("e2", "INSERT", "u2", "bob@example.com", 1000) // crash replay
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    runOnce() // restart: recovery from checkpoint
    println(s"--- state after restart + batch 2 (u1 updated, u2 deleted):")
    CdcPipeline.currentState(spark, base.resolve("state").toString)
      .foreach(_.show(false))

    println(s"work dir: $base")
    spark.stop()
  }
}
