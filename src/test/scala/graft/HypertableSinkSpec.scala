package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.HypertableSink

/** Hypertable-analog sink: bucket layout, directory pruning, row parity. */
class HypertableSinkSpec extends SparkSpec {

  test("day-bucketed write prunes partitions on time-range reads") {
    val out = Files.createTempDirectory("graft-hyper").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    HypertableSink.write(events, out, "event_time", "day")

    val all = HypertableSink.read(spark, out)
    assert(all.count() == events.count())

    // pick a real bucket and query just it (day labels are plain dates
    // now, so the read-back partition column infers as DateType — keep
    // the native type so the equality stays a PartitionFilter)
    val someBucket = all.select("time_bucket").distinct()
      .orderBy("time_bucket").head().get(0)
    val oneDay = all.where(col("time_bucket") === lit(someBucket))
    assert(HypertableSink.prunesPartitions(oneDay),
      "bucket predicate must become a PartitionFilter:\n" +
        oneDay.queryExecution.executedPlan.toString)
    val expected = events
      .where(date_format(date_trunc("day", col("event_time")),
        "yyyy-MM-dd") === someBucket.toString).count()
    assert(oneDay.count() == expected)

    // appending a second batch never rewrites existing buckets
    val before = all.inputFiles.toSet
    HypertableSink.write(events.limit(10), out, "event_time", "day")
    val after = HypertableSink.read(spark, out).inputFiles.toSet
    assert(before.subsetOf(after))
  }
}
