package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run streaming throughput benches standalone, N times.
  * Usage: runMain graft.tools.StreamBench [n] [which]
  * `which` ∈ eps (default) | ann | cdc | visual | audio — one bench per
  * run so a single metric can be re-measured on an idle machine.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2
    val which = if (args.length > 1) args(1) else "eps"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to n).foreach { i =>
      val line = which match {
        case "eps" =>
          val eps = graft.streaming.ThroughputBench.run(spark)
          val multi = graft.streaming.ThroughputBench.runMulti(spark)
          f"eps=$eps%.0f multi=$multi%.0f"
        case "ann" =>
          f"qps_ann=${graft.streaming.ThroughputBench.runAnnServe(spark, sfDir)}%.0f"
        case "cdc" =>
          f"vps_cdc=${graft.streaming.ThroughputBench.runIndexCdc(spark, sfDir)}%.0f"
        case "visual" =>
          f"ips_visual=${graft.streaming.ThroughputBench.runVisualIngest(spark, sfDir)}%.0f"
        case "audio" =>
          f"ips_audio=${graft.streaming.ThroughputBench.runAudioIngest(spark, sfDir)}%.0f"
        case other => sys.error(s"unknown bench '$other'")
      }
      println(s"[streambench] run $i: $line")
    }
    spark.stop()
  }
}
