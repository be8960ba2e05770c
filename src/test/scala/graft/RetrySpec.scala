package graft

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{Retry, RetryPolicy}

/** Backoff math + classification goldens mirroring
  * `tests/unit/test_retry_logic.py:14-154`. */
class RetrySpec extends AnyFunSuite {

  test("backoff grows geometrically and caps (retry.py:38-57)") {
    val p = RetryPolicy(baseDelayMs = 100, multiplier = 2.0, maxDelayMs = 30000)
    assert(p.backoffMs(1) == 100)
    assert(p.backoffMs(2) == 200)
    assert(p.backoffMs(3) == 400)
    assert(p.backoffMs(10) == 30000) // 100·2^9 = 51200 → capped
  }

  test("jitter stays within ±25% (retry.py:59-70)") {
    val p = RetryPolicy()
    val base = p.backoffMs(3).toDouble
    val rng = new Random(42)
    val samples = (1 to 2000).map(_ => p.backoffWithJitterMs(3, rng).toDouble)
    assert(samples.forall(d => d >= base * 0.75 - 1 && d <= base * 1.25 + 1))
    // jitter actually varies (not a constant)
    assert(samples.distinct.size > 100)
  }

  test("classification: connection-ish errors retryable, others permanent") {
    assert(Retry.isRetryable(new java.net.ConnectException("refused")))
    assert(Retry.isRetryable(new RuntimeException("Connection reset by peer")))
    assert(Retry.isRetryable(new RuntimeException("read timed out")))
    assert(!Retry.isRetryable(new IllegalArgumentException("bad schema")))
    assert(!Retry.isRetryable(new RuntimeException("syntax error")))
  }

  test("withRetry: succeeds after transient failures, counts attempts") {
    var calls = 0
    val out = Retry.withRetry(RetryPolicy(maxAttempts = 5), sleep = _ => ()) {
      calls += 1
      if (calls < 3) throw new RuntimeException("connection reset")
      42
    }
    assert(out == Retry.Succeeded(42, 3))
  }

  test("withRetry: permanent error fails fast; retryable exhausts") {
    var calls = 0
    val perm = Retry.withRetry(RetryPolicy(maxAttempts = 5), sleep = _ => ()) {
      calls += 1; throw new IllegalStateException("constraint violation")
    }
    assert(perm.isInstanceOf[Retry.Permanent] && calls == 1)

    calls = 0
    val exh = Retry.withRetry(RetryPolicy(maxAttempts = 3), sleep = _ => ()) {
      calls += 1; throw new RuntimeException("timeout")
    }
    assert(exh.isInstanceOf[Retry.Exhausted] && calls == 3)
  }
}
