package graft.config

import java.io.File
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.sinks.RetryPolicy

/** Pipeline configuration mirroring the reference's `pipeline.yaml` shape
  * and settings model (`src/config/settings.py:124-151`,
  * `src/config/loader.py:112-168`, `config/pipeline.example.yaml`):
  * `cassandra:` (source), `destinations:` (postgres / clickhouse /
  * timescaledb), `pipeline:` tuning, `retry:`, `observability:`, plus a
  * graft `dlq:` section. Field names, defaults, and validation ranges are
  * the reference's.
  *
  * Precedence matches the reference loader: YAML value ← environment
  * override (`CDC_<SECTION>_<FIELD>`, e.g. `CDC_PIPELINE_BATCH_SIZE`,
  * `CDC_POSTGRES_HOST`, `CDC_RETRY_MAX_ATTEMPTS`) ← built-in default when
  * neither is present. Credentials are env-only, never read from the file
  * (`pipeline.example.yaml:3` keeps them out of YAML by design).
  */
final case class SourceSettings(
    hosts: Seq[String] = Seq("localhost"),
    port: Int = 9042,
    keyspace: String = "cdc_keyspace",
    cdcRawDirectory: String = "/var/lib/cassandra/cdc_raw",
    sslEnabled: Boolean = true)

final case class DestinationSettings(
    name: String, // postgres | clickhouse | timescaledb
    enabled: Boolean = false,
    host: String = "localhost",
    port: Int = 5432,
    database: String = "cdc_db",
    username: Option[String] = None,
    password: Option[String] = None,
    connectionPoolSize: Int = 10)

final case class PipelineTuning(
    batchSize: Int = 100,
    maxParallelism: Int = 4,
    maxInFlightBatches: Int = 10,
    pollIntervalMs: Long = 100)

final case class RetrySettings(
    maxAttempts: Int = 5,
    baseDelayMs: Long = 100,
    maxDelayMs: Long = 30000,
    backoffMultiplier: Double = 2.0,
    jitter: Boolean = true) {
  def toPolicy: RetryPolicy = RetryPolicy(
    maxAttempts = maxAttempts, baseDelayMs = baseDelayMs,
    multiplier = backoffMultiplier, maxDelayMs = maxDelayMs,
    jitterFraction = if (jitter) 0.25 else 0.0)
}

final case class ObservabilitySettings(
    metricsPort: Int = 9090,
    metricsPath: String = "/metrics",
    healthCheckPort: Int = 8080,
    healthCheckPath: String = "/health",
    logLevel: String = "INFO",
    logFormat: String = "json",
    enableTracing: Boolean = false,
    tracingEndpoint: Option[String] = None)

final case class PipelineConfig(
    source: SourceSettings = SourceSettings(),
    destinations: Seq[DestinationSettings] = Nil,
    pipeline: PipelineTuning = PipelineTuning(),
    retry: RetrySettings = RetrySettings(),
    observability: ObservabilitySettings = ObservabilitySettings(),
    dlqDirectory: String = "dlq",
    maskingRulesFile: Option[String] = None) {
  def enabledDestinations: Seq[DestinationSettings] =
    destinations.filter(_.enabled)
}

object PipelineConfig {

  /** Load config; `path = None` = env/defaults only (`loader.py:160-168`). */
  def load(path: Option[String],
      env: String => Option[String] = sys.env.get): PipelineConfig = {
    val root: JsonNode = path match {
      case Some(p) =>
        val f = new File(p)
        if (!f.isFile) throw new java.io.FileNotFoundException(p)
        new ObjectMapper(new YAMLFactory()).readTree(f)
      case None => new ObjectMapper().createObjectNode()
    }
    val cfg = fromNode(root, env)
    validate(cfg)
    cfg
  }

  // ---- node + env plumbing -------------------------------------------------

  private def section(root: JsonNode, name: String): JsonNode =
    Option(root.get(name)).getOrElse(
      new ObjectMapper().createObjectNode())

  /** YAML field ← `CDC_<SECTION>_<FIELD>` env override ← default. */
  private final class Fields(node: JsonNode, envPrefix: String,
      env: String => Option[String]) {
    private def envKey(field: String) =
      s"CDC_${envPrefix}_${field.toUpperCase}"
    private def raw(field: String): Option[String] =
      env(envKey(field)).orElse(Option(node.get(field)).map(_.asText))
    def str(field: String, dflt: String): String = raw(field).getOrElse(dflt)
    def opt(field: String): Option[String] = raw(field).filter(_.nonEmpty)
    def int(field: String, dflt: Int): Int =
      raw(field).map(v => parse(field, v, _.toInt)).getOrElse(dflt)
    def long(field: String, dflt: Long): Long =
      raw(field).map(v => parse(field, v, _.toLong)).getOrElse(dflt)
    def dbl(field: String, dflt: Double): Double =
      raw(field).map(v => parse(field, v, _.toDouble)).getOrElse(dflt)
    def bool(field: String, dflt: Boolean): Boolean =
      raw(field).map(v => parse(field, v, _.toBoolean)).getOrElse(dflt)
    def strList(field: String, dflt: Seq[String]): Seq[String] =
      env(envKey(field)).map(_.split(",").toSeq.map(_.trim)).orElse(
        Option(node.get(field)).filter(_.isArray).map { arr =>
          (0 until arr.size()).map(arr.get(_).asText)
        }).getOrElse(dflt)
    private def parse[A](field: String, v: String, f: String => A): A =
      try f(v) catch {
        case _: Exception => throw new IllegalArgumentException(
          s"config: $envPrefix.$field: cannot parse '$v'")
      }
  }

  private def fromNode(root: JsonNode,
      env: String => Option[String]): PipelineConfig = {
    val cas = new Fields(section(root, "cassandra"), "CASSANDRA", env)
    val pip = new Fields(section(root, "pipeline"), "PIPELINE", env)
    val ret = new Fields(section(root, "retry"), "RETRY", env)
    val obs = new Fields(section(root, "observability"), "OBSERVABILITY", env)
    val dlq = new Fields(section(root, "dlq"), "DLQ", env)
    val dests = section(root, "destinations")
    def dest(name: String, defaultPort: Int): DestinationSettings = {
      val d = new Fields(section(dests, name), name.toUpperCase, env)
      DestinationSettings(
        name = name,
        enabled = d.bool("enabled", dflt = false),
        host = d.str("host", "localhost"),
        port = d.int("port", defaultPort),
        database = d.str("database", "cdc_db"),
        username = d.opt("username"), // env-only in the example config
        password = d.opt("password"),
        connectionPoolSize = d.int("connection_pool_size", 10))
    }
    PipelineConfig(
      source = SourceSettings(
        hosts = cas.strList("hosts", Seq("localhost")),
        port = cas.int("port", 9042),
        keyspace = cas.str("keyspace", "cdc_keyspace"),
        cdcRawDirectory = cas.str("cdc_raw_directory", "/var/lib/cassandra/cdc_raw"),
        sslEnabled = cas.bool("ssl_enabled", dflt = true)),
      destinations = Seq(
        dest("postgres", 5432), dest("clickhouse", 9000),
        dest("timescaledb", 5433)),
      pipeline = PipelineTuning(
        batchSize = pip.int("batch_size", 100),
        maxParallelism = pip.int("max_parallelism", 4),
        maxInFlightBatches = pip.int("max_in_flight_batches", 10),
        pollIntervalMs = pip.long("poll_interval_ms", 100)),
      retry = RetrySettings(
        maxAttempts = ret.int("max_attempts", 5),
        baseDelayMs = ret.long("base_delay_ms", 100),
        maxDelayMs = ret.long("max_delay_ms", 30000),
        backoffMultiplier = ret.dbl("backoff_multiplier", 2.0),
        jitter = ret.bool("jitter", dflt = true)),
      observability = ObservabilitySettings(
        metricsPort = obs.int("metrics_port", 9090),
        metricsPath = obs.str("metrics_path", "/metrics"),
        healthCheckPort = obs.int("health_check_port", 8080),
        healthCheckPath = obs.str("health_check_path", "/health"),
        logLevel = obs.str("log_level", "INFO"),
        logFormat = obs.str("log_format", "json"),
        enableTracing = obs.bool("enable_tracing", dflt = false),
        tracingEndpoint = obs.opt("tracing_endpoint")),
      dlqDirectory = dlq.str("directory", "dlq"),
      maskingRulesFile =
        env("CDC_MASKING_RULES_FILE").orElse(
          Option(root.get("masking_rules_file")).map(_.asText)))
  }

  // ---- validation (ranges from settings.py Field constraints) -------------

  private def validate(c: PipelineConfig): Unit = {
    def range(name: String, v: Long, lo: Long, hi: Long): Unit =
      require(v >= lo && v <= hi, s"config: $name=$v outside [$lo, $hi]")
    range("pipeline.batch_size", c.pipeline.batchSize, 1, 10000)
    range("pipeline.max_parallelism", c.pipeline.maxParallelism, 1, 64)
    range("pipeline.max_in_flight_batches", c.pipeline.maxInFlightBatches, 1, 1000)
    range("pipeline.poll_interval_ms", c.pipeline.pollIntervalMs, 10, 60000)
    range("retry.max_attempts", c.retry.maxAttempts, 1, 100)
    range("retry.base_delay_ms", c.retry.baseDelayMs, 10, 10000)
    range("retry.max_delay_ms", c.retry.maxDelayMs, 100, 300000)
    require(c.retry.backoffMultiplier >= 1.0 && c.retry.backoffMultiplier <= 10.0,
      s"config: retry.backoff_multiplier=${c.retry.backoffMultiplier} outside [1.0, 10.0]")
    (c.destinations.map(d => d.name -> d.port) :+
      ("cassandra" -> c.source.port) :+
      ("observability.metrics" -> c.observability.metricsPort) :+
      ("observability.health_check" -> c.observability.healthCheckPort))
      .foreach { case (n, p) => range(s"$n.port", p, 1, 65535) }
    val ll = Set("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL")
    require(ll.contains(c.observability.logLevel),
      s"config: observability.log_level=${c.observability.logLevel} not in $ll")
    require(Set("json", "console").contains(c.observability.logFormat),
      s"config: observability.log_format=${c.observability.logFormat}")
  }
}
