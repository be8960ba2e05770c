package graft

import java.nio.file.Files
import graft.sinks.DlqSink

/** DLQ format + retrieval semantics (`tests/unit/test_dlq.py:16-213`). */
class DlqSpec extends SparkSpec {
  import spark.implicits._

  test("write/read/count round-trip, partitioned by destination and date") {
    val dir = Files.createTempDirectory("dlq").toString
    val failed = Seq(("e1", "users"), ("e2", "users")).toDF("event_id", "table_name")
    DlqSink.write(failed, dir, "postgres", "SchemaError", "boom",
      failedAtMicros = 1704067200000000L) // 2024-01-01
    DlqSink.write(failed.limit(1), dir, "clickhouse", "Timeout", "slow",
      failedAtMicros = 1704067200000000L)

    assert(DlqSink.count(spark, dir, "postgres") == 2)
    assert(DlqSink.count(spark, dir, "clickhouse") == 1)
    val row = DlqSink.read(spark, dir, "postgres").head()
    assert(row.getAs[String]("error_type") == "SchemaError")
    // partition-column inference reads the date partition back as DateType
    assert(row.getAs[Any]("failed_date").toString == "2024-01-01")
    // append mode accumulates (writer.py append semantics)
    DlqSink.write(failed, dir, "postgres", "SchemaError", "boom2",
      failedAtMicros = 1704153600000000L) // next day
    assert(DlqSink.count(spark, dir, "postgres") == 4)
  }
}
