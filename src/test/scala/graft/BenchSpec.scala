package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression gate for the bench's round-over-round delta source: r03
  * shipped an empty `prev_delta_sec` because the driver's front-truncated
  * tail silently failed to parse. The committed `BENCH_LOCAL_r{N}.json`
  * snapshot (plus tail scavenging) must always yield a usable map. */
class BenchSpec extends AnyFunSuite {

  test("previousBench finds a non-empty per-query map for delta emission") {
    val (name, prev) = Bench.previousBench()
    assert(name.nonEmpty, "no previous bench source found at repo root")
    assert(name.matches("BENCH(_LOCAL)?_r\\d+\\.json"), s"odd source '$name'")
    assert(prev.nonEmpty,
      "previous-round per-query times came back empty — deltas would vanish")
    // a usable map covers most of the pack and holds sane positive seconds
    assert(prev.size >= SparkEntry.queries.size / 2,
      s"only ${prev.size} of ${SparkEntry.queries.size} queries recovered")
    prev.values.foreach(v => assert(v > 0 && v < 600))
  }
}
