package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the production installation path of the extensions: a session
  * built with `spark.sql.extensions=graft.plans.GraftExtensions`. */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT hmac_sha256('x', 'k') AS t, " +
      "float_vec_dot(CAST(array(1.0,2.0) AS ARRAY<FLOAT>), " +
      "CAST(array(3.0,4.0) AS ARRAY<FLOAT>)) AS d").show(false)
    spark.stop()
  }
}
