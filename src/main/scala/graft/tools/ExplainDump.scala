package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: write `df.explain("formatted")` for the named queries to
  * `<outDir>/<name>_<tag>.txt` — the optimization round's before/after
  * plan evidence (plans/r16/...).
  * Usage: runMain graft.tools.ExplainDump <name[,name...]> <tag> [outDir] [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val tag = args(1)
    val outDir = if (args.length > 2) args(2) else "plans/r16"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val text = graft.plans.PlanCapture.explainText(df)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        text.getBytes(StandardCharsets.UTF_8))
      val shuffles = "Exchange (hash|range|Single)".r.findAllIn(text).size
      val reused = "ReusedExchange".r.findAllIn(text).size
      val bcast = "BroadcastExchange".r.findAllIn(text).size
      println(s"[explain] $name -> $outDir/${name}_$tag.txt " +
        s"(exchanges=$shuffles reused=$reused bcast=$bcast)")
    }
    spark.stop()
  }
}
