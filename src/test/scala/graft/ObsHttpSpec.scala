package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.obs.{HealthStatus, MetricsListener, ObsHttpServer}

/** HTTP exposure of /health + /metrics, mirroring the reference's
  * Prometheus exporter + aiohttp health route
  * (`src/observability/metrics.py:46-54`, `health.py:87-119`). */
class ObsHttpSpec extends SparkSpec {

  private def get(port: Int, path: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build(),
      HttpResponse.BodyHandlers.ofString())

  test("serves health JSON with load-balancer status codes") {
    val health = new HealthStatus("1.2.3")
    val srv = new ObsHttpServer(health, new MetricsListener).start()
    try {
      // no dependencies registered -> unhealthy -> 503 (health.py:50-61)
      val down = get(srv.port, "/health")
      assert(down.statusCode() == 503)
      assert(down.body().contains("\"status\":\"unhealthy\""))

      health.update("postgres", up = true, latencyMs = 12.0)
      health.update("clickhouse", up = true, latencyMs = 1500.0) // DEGRADED
      val degraded = get(srv.port, "/health")
      assert(degraded.statusCode() == 200)
      assert(degraded.body().contains("\"status\":\"degraded\""))
      assert(degraded.body().contains("\"version\":\"1.2.3\""))
      assert(degraded.body().contains("\"state\":\"DEGRADED\""))

      health.update("clickhouse", up = true, latencyMs = 30.0)
      assert(get(srv.port, "/health").body().contains("\"status\":\"healthy\""))
    } finally srv.stop()
  }

  test("serves Prometheus exposition with the reference metric names") {
    val metrics = new MetricsListener
    val srv = new ObsHttpServer(new HealthStatus, metrics).start()
    try {
      val resp = get(srv.port, "/metrics")
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/plain"))
      val body = resp.body()
      Seq("cdc_events_processed_total", "cdc_errors_total",
        "cdc_events_per_second", "cdc_backlog_depth").foreach { name =>
        assert(body.contains(s"# TYPE $name"), s"missing series $name")
      }
    } finally srv.stop()
  }
}
