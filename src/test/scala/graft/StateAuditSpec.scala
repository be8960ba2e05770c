package graft

import graft.streaming.StateAudit

/** TTL eviction actually bounds streaming-twin state: across
  * key-disjoint waves separated by the TTL horizon, final state rows
  * stay O(one wave), not O(waves) — the measured form of every twin's
  * "dedup against the recent past" scale claim. */
class StateAuditSpec extends SparkSpec {

  test("state rows stay bounded across TTL-expiring key-disjoint waves " +
      "for all four stateful twins") {
    val waves = 3
    val keys = 60
    val out = StateAudit.run(spark, waves = waves, keysPerWave = keys,
      ttlSeconds = 3)
    assert(out.map(_.twin).toSet ==
      Set("neardup", "passage", "latest", "cms"))
    out.foreach { t =>
      assert(t.rowsWave1 > 0, s"${t.twin}: no state after wave 1")
      assert(t.rowsFinal >= 0 && t.bytesFinal > 0,
        s"${t.twin}: missing state metrics (${t.rowsFinal}, ${t.bytesFinal})")
      // bounded: the store holds ~the live horizon (the last wave plus
      // rows whose purge is still pending one maintenance slot), never
      // the full key history. Without eviction rowsFinal ≈ waves ×
      // rowsWave1; the 2× budget leaves room for purge lag while still
      // refuting linear growth at waves = 3.
      assert(t.rowsFinal <= 2L * t.rowsWave1,
        s"${t.twin}: state grew ${t.rowsWave1} -> ${t.rowsFinal} over " +
          s"$waves disjoint waves — TTL eviction is not bounding it")
    }
  }
}
