package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.obs.MetricsListener
import graft.sinks.AppendVersionedSink

/** Runnable tour of the streaming analytics surface: file-source events →
  * event-time tumbling windows with a watermark, an append-versioned sink
  * collapsed by its read view, and listener-driven metrics.
  *
  * Usage: `sbt "runMain graft.streaming.StreamingDemo"`.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.streams.addListener(listener)

    val base = Files.createTempDirectory("stream-demo")
    val events = Files.createDirectories(base.resolve("events"))
    def line(tsMin: Int, user: String, v: Double): String =
      s"""{"ts":"2024-01-01T10:${f"$tsMin%02d"}:00.000Z","user":"$user","v":$v}"""
    Files.write(events.resolve("a.json"), Seq(
      line(1, "u1", 1.0), line(3, "u1", 2.0), line(7, "u2", 4.0),
      line(12, "u1", 8.0), line(41, "u2", 16.0) // advances the watermark
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))

    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("user", StringType), StructField("v", DoubleType)))
    val stream = spark.readStream.schema(schema).json(events.toString)
    val agg = WindowedAggs.tumbling(stream, "ts", "10 minutes",
      "5 minutes", "user", "v")
    val q = agg.writeStream.format("memory").queryName("demo_windows")
      .outputMode("update")
      .option("checkpointLocation", base.resolve("ckpt").toString).start()
    q.processAllAvailable(); q.stop()
    println("--- tumbling 5m windows per user:")
    spark.table("demo_windows").orderBy("window_start", "user").show(false)

    val sink = new AppendVersionedSink(base.resolve("avs").toString,
      keyNames = Seq("user"), versionCol = "ver")
    import spark.implicits._
    sink.append(Seq(("u1", 1L, "INSERT", 10.0), ("u2", 1L, "INSERT", 20.0))
      .toDF("user", "ver", "event_type", "balance"), 1)
    sink.append(Seq(("u1", 2L, "UPDATE", 15.0), ("u2", 2L, "DELETE", 0.0))
      .toDF("user", "ver", "event_type", "balance"), 2)
    println(s"--- versioned sink: raw appends = ${sink.raw(spark).count()}, view:")
    sink.view(spark).show(false)

    println("--- metrics snapshot:")
    listener.snapshot.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"  $k%-45s $v%.1f") }
    spark.stop()
  }
}
