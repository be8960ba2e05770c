package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run the streaming throughput benches standalone, N times.
  * Usage: runMain graft.tools.StreamBench [n]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to n).foreach { i =>
      val eps = graft.streaming.ThroughputBench.run(spark)
      val multi = graft.streaming.ThroughputBench.runMulti(spark)
      println(f"[streambench] run $i: eps=$eps%.0f multi=$multi%.0f")
    }
    spark.stop()
  }
}
