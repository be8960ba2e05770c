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
    assert(name.matches("BENCH(_LOCAL)?(_r\\d+)?\\.json"), s"odd source '$name'")
    assert(prev.nonEmpty,
      "previous-round per-query times came back empty — deltas would vanish")
    // a usable map covers most of the pack and holds sane positive seconds
    assert(prev.size >= SparkEntry.queries.size / 2,
      s"only ${prev.size} of ${SparkEntry.queries.size} queries recovered")
    prev.values.foreach(v => assert(v > 0 && v < 600))
  }

  test("end-of-round state: truncated driver file + stale snapshot still yields deltas") {
    // Reproduce the exact repo state r04 ended in (VERDICT r04 item 1):
    // the newest driver BENCH_r{N}.json has a tail front-truncated PAST
    // the per-query section, and the only snapshot is round N−1. The
    // stale snapshot must win over an empty map, labeled by its real name.
    val dir = java.nio.file.Files.createTempDirectory("benchspec").toFile
    try {
      val q = SparkEntry.queries.keySet.take(3)
        .map(k => "\"" + k + "\":0.500").mkString("{", ",", "}")
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_LOCAL_r3.json"),
        s"""{"metric":"total","value":1.5,"queries":$q}""".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_r4.json"),
        """{"n":4,"parsed":null,"tail":"data/sf0.1\",\"warmup\":null,\"prev\":\"x\",\"prev_delta_sec\":{}}"}""".getBytes("UTF-8"))
      val (name, prev) = Bench.previousBench(Seq(dir))
      assert(name == "BENCH_LOCAL_r3.json", s"expected stale snapshot, got '$name'")
      assert(prev.size == 3 && prev.values.forall(_ == 0.5))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("scavenge cuts before queries_spread_sec so spreads never pose as seconds") {
    // r6 bench lines carry a queries_spread_sec map re-using the query
    // names; a front-truncated driver tail must recover only the REAL
    // per-query seconds, never the spread values that follow them
    val dir = java.nio.file.Files.createTempDirectory("benchspec3").toFile
    try {
      val names = SparkEntry.queries.keySet.toSeq.sorted.take(3)
      val q = names.map(k => "\"" + k + "\":0.500").mkString(",")
      val sp = names.map(k => "\"" + k + "\":9.999").mkString(",")
      // FRONT-TRUNCATED tail: no {"metric" prefix, so only the scavenger
      // can recover it — mid-queries fragment, then the spread map
      val tail = s"""5,$q},""" +
        s""""queries_spread_sec":{$sp},"corpus":{"docs":5},"stream_eps":1}"""
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_r4.json"),
        s"""{"n":4,"parsed":null,"tail":${
          com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
            .writeValueAsString(tail)}}""".getBytes("UTF-8"))
      val (name, prev) = Bench.previousBench(Seq(dir))
      assert(name == "BENCH_r4.json")
      assert(prev.size == 3 && prev.values.forall(_ == 0.5),
        s"scavenge picked up spread values: $prev")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("workdir BENCH_LOCAL.json (full line, sf match) beats truncated driver file") {
    // r7 state: no numbered snapshot for the round, driver tail truncated
    // past the queries section, but the full line Bench wrote is on disk.
    val dir = java.nio.file.Files.createTempDirectory("benchspec4").toFile
    try {
      val q = SparkEntry.queries.keySet.take(4)
        .map(k => "\"" + k + "\":0.125").mkString("{", ",", "}")
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_LOCAL.json"),
        s"""{"metric":"total","value":0.5,"queries":$q,"sf":"/root/testdata/sf0.1"}"""
          .getBytes("UTF-8"))
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_r7.json"),
        """{"n":7,"parsed":null,"tail":"prev_delta_sec\":{}}"}""".getBytes("UTF-8"))
      val (name, prev) = Bench.previousBench(Seq(dir))
      assert(name == "BENCH_LOCAL.json", s"expected workdir line, got '$name'")
      assert(prev.size == 4 && prev.values.forall(_ == 0.125))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("workdir BENCH_LOCAL.json at a different SF is ignored") {
    // a mid-round local iteration run (sf0.01) must not pose as the
    // previous round's sf0.1 numbers — fall through to the stale snapshot
    val dir = java.nio.file.Files.createTempDirectory("benchspec5").toFile
    try {
      val q = SparkEntry.queries.keySet.take(3)
        .map(k => "\"" + k + "\":0.500").mkString("{", ",", "}")
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_LOCAL.json"),
        s"""{"metric":"total","value":1.5,"queries":$q,"sf":"/root/testdata/sf0.01"}"""
          .getBytes("UTF-8"))
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_LOCAL_r6.json"),
        s"""{"metric":"total","value":1.5,"queries":$q}""".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_r7.json"),
        """{"n":7,"parsed":null,"tail":""}""".getBytes("UTF-8"))
      val (name, prev) = Bench.previousBench(Seq(dir))
      assert(name == "BENCH_LOCAL_r6.json", s"expected stale snapshot, got '$name'")
      assert(prev.size == 3)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("same-round snapshot preferred over driver file") {
    val dir = java.nio.file.Files.createTempDirectory("benchspec2").toFile
    try {
      val q = SparkEntry.queries.keySet.take(3)
        .map(k => "\"" + k + "\":0.250").mkString("{", ",", "}")
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_LOCAL_r4.json"),
        s"""{"metric":"total","value":0.75,"queries":$q}""".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.toPath.resolve("BENCH_r4.json"),
        """{"n":4,"parsed":null,"tail":""}""".getBytes("UTF-8"))
      val (name, prev) = Bench.previousBench(Seq(dir))
      assert(name == "BENCH_LOCAL_r4.json")
      assert(prev.size == 3 && prev.values.forall(_ == 0.25))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
