package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Session-lifetime memo for the driver-side corpus counts that size the
  * adaptive geometries (IVF/SemDeDup centroid stride `⌊√N⌋`, the
  * embedding-LSH planes-per-band ladder): the `adaptiveStrideOf`-style
  * derivations run a column-pruned `count()` per CALL, and a bench pass
  * has ~20 stride consumers over the same two or three corpus frames —
  * r13 measured the redundant count jobs as the bulk of a 173→187 s
  * local-pack regression. The count is a pure function of (plan, corpus
  * file bytes), so the cache key combines:
  *
  *   - the CANONICALIZED analyzed plan (Spark's `sameResult` machinery:
  *     exprIds normalized positionally, file relations compared by root
  *     paths) — two independently-built frames with the same reads,
  *     filters, and projections share an entry, while a different
  *     population filter over the same files gets its own;
  *   - every file-source leaf's root paths AND the file index's total
  *     byte size — a regenerated corpus at the same path invalidates via
  *     the size (a parquet re-encode producing byte-identical totals for
  *     different rows is implausible; the `ensureArtifacts` fingerprint
  *     lesson — driver-side metadata only, no data scan).
  *
  * A frame with any non-file leaf (in-memory test data, checkpoints,
  * streaming) is counted directly and never cached — correctness first,
  * the memo is a bench optimization. The map holds a few dozen Longs per
  * session; no eviction. */
object CorpusCount {
  private val cache = new ConcurrentHashMap[String, java.lang.Long]()

  /** The memoized `df.count()`. */
  def memo(df: DataFrame): Long =
    fingerprint(df) match {
      case Some(fp) => cache.computeIfAbsent(fp, _ => df.count()).longValue()
      case None => df.count()
    }

  /** Plan-canonical + file-bytes key; None when any leaf is not a file
    * relation (then the count must run uncached). */
  private def fingerprint(df: DataFrame): Option[String] = {
    val analyzed = df.queryExecution.analyzed
    val keys = analyzed.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some(fs.location.rootPaths.mkString(",") + "#" +
            fs.location.sizeInBytes)
        case _ => None
      }
      case _ => None
    }
    if (keys.nonEmpty && keys.forall(_.isDefined)) {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(analyzed.canonicalized.toString.getBytes("UTF-8"))
      md.update(keys.flatten.sorted.mkString(";").getBytes("UTF-8"))
      Some(md.digest().map("%02x".format(_)).mkString)
    } else None
  }

  /** Test seams: entry count, and a reset for spec isolation. */
  private[graft] def size: Int = cache.size()
  private[graft] def clear(): Unit = cache.clear()
}
