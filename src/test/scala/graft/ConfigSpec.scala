package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.config.PipelineConfig

/** YAML + env config loading mirroring the reference's loader/settings
  * (`src/config/loader.py:112-168`, `src/config/settings.py:124-151`,
  * shape from `config/pipeline.example.yaml`). */
class ConfigSpec extends AnyFunSuite {

  private def write(yaml: String): String = {
    val f = Files.createTempFile("pipeline", ".yaml")
    Files.write(f, yaml.getBytes("UTF-8"))
    f.toString
  }

  private val exampleShape =
    """cassandra:
      |  hosts:
      |    - "cass-1"
      |    - "cass-2"
      |  port: 9042
      |  keyspace: "production"
      |  cdc_raw_directory: "/var/lib/cassandra/cdc_raw"
      |  ssl_enabled: true
      |destinations:
      |  postgres:
      |    enabled: true
      |    host: "pg"
      |    port: 5432
      |    database: "warehouse"
      |    connection_pool_size: 10
      |  clickhouse:
      |    enabled: true
      |    host: "ch"
      |    port: 9000
      |    database: "warehouse"
      |  timescaledb:
      |    enabled: false
      |    host: "tsdb"
      |    port: 5433
      |    database: "warehouse"
      |pipeline:
      |  batch_size: 250
      |  max_parallelism: 8
      |  max_in_flight_batches: 20
      |  poll_interval_ms: 500
      |retry:
      |  max_attempts: 7
      |  base_delay_ms: 50
      |  max_delay_ms: 20000
      |  backoff_multiplier: 3.0
      |  jitter: false
      |observability:
      |  metrics_port: 9091
      |  metrics_path: "/metrics"
      |  health_check_port: 8081
      |  health_check_path: "/health"
      |  log_level: "DEBUG"
      |  log_format: "console"
      |dlq:
      |  directory: "/tmp/dlq"
      |""".stripMargin

  test("loads the reference pipeline.example.yaml shape") {
    val cfg = PipelineConfig.load(Some(write(exampleShape)), env = _ => None)
    assert(cfg.source.hosts == Seq("cass-1", "cass-2"))
    assert(cfg.source.keyspace == "production")
    assert(cfg.pipeline.batchSize == 250)
    assert(cfg.pipeline.pollIntervalMs == 500L)
    assert(cfg.retry.maxAttempts == 7)
    assert(cfg.retry.backoffMultiplier == 3.0)
    assert(cfg.enabledDestinations.map(_.name) == Seq("postgres", "clickhouse"))
    assert(cfg.destinations.find(_.name == "timescaledb").exists(!_.enabled))
    assert(cfg.observability.metricsPort == 9091)
    assert(cfg.dlqDirectory == "/tmp/dlq")
    // retry settings → policy (jitter off ⇒ deterministic backoff)
    val p = cfg.retry.toPolicy
    assert(p.maxAttempts == 7 && p.jitterFraction == 0.0)
    assert(p.backoffMs(3) == 50L * 3 * 3)
  }

  test("the repo's own config/pipeline.example.yaml loads") {
    val cfg = PipelineConfig.load(Some("config/pipeline.example.yaml"),
      env = _ => None)
    assert(cfg.enabledDestinations.map(_.name) == Seq("postgres", "clickhouse"))
    assert(cfg.pipeline.batchSize == 100)
  }

  test("environment variables override YAML (loader.py:144-146)") {
    val env = Map(
      "CDC_PIPELINE_BATCH_SIZE" -> "999",
      "CDC_POSTGRES_HOST" -> "pg-prod",
      "CDC_POSTGRES_PASSWORD" -> "s3cret", // env-only credential
      "CDC_RETRY_MAX_ATTEMPTS" -> "2",
      "CDC_TIMESCALEDB_ENABLED" -> "true",
      "CDC_DLQ_DIRECTORY" -> "/env/dlq")
    val cfg = PipelineConfig.load(Some(write(exampleShape)), env = env.get)
    assert(cfg.pipeline.batchSize == 999)
    assert(cfg.destinations.find(_.name == "postgres").get.host == "pg-prod")
    assert(cfg.destinations.find(_.name == "postgres").get.password
      .contains("s3cret"))
    assert(cfg.retry.maxAttempts == 2)
    assert(cfg.enabledDestinations.map(_.name).contains("timescaledb"))
    assert(cfg.dlqDirectory == "/env/dlq")
  }

  test("no file ⇒ env/defaults only; missing file ⇒ FileNotFound") {
    val cfg = PipelineConfig.load(None, env = _ => None)
    assert(cfg.pipeline.batchSize == 100 && cfg.retry.maxAttempts == 5)
    assert(cfg.enabledDestinations.isEmpty)
    intercept[java.io.FileNotFoundException] {
      PipelineConfig.load(Some("/does/not/exist.yaml"))
    }
  }

  test("validation enforces the settings.py field ranges") {
    def bad(yaml: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        PipelineConfig.load(Some(write(yaml)), env = _ => None)
      }
      assert(e.getMessage.contains("config"))
    }
    bad("pipeline:\n  batch_size: 0\n")
    bad("pipeline:\n  batch_size: 20000\n")
    bad("retry:\n  backoff_multiplier: 0.5\n")
    bad("observability:\n  log_level: \"TRACE\"\n")
    bad("destinations:\n  postgres:\n    port: 99999\n")
    // unparseable numeric
    bad("pipeline:\n  batch_size: \"lots\"\n")
  }
}
