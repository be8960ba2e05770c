package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting — the reproducibility layer of a
  * training-data pipeline. RNG-based `TABLESAMPLE` gives a different
  * sample per run (and per engine); hashing the stable id instead makes
  * the selection a pure function of the data, so a 100 TB corpus splits
  * identically on every rerun, every engine, every partition layout —
  * and membership can be checked per-row without global state. Both
  * operators are narrow (no shuffle for the split; one bounded top-k
  * shuffle for the stratified sample).
  */
object Sampling {

  /** Percent bucket 0–99 from the md5 of the id: the standard
    * hash-mod-100 split key. */
  private def hashBucket(idCol: String) =
    (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 100).as("bucket")

  /** Per-document split name (train/val/test, 80/10/10) — the assignment
    * behind [[hashSplit]]'s rollup, reusable by other operators. */
  private[operators] def splitAssign(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), hashBucket("doc_id"))
      .select(col("doc_id"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test").as("split"))

  /** Split-leakage (contamination) check: near-duplicate pairs whose two
    * documents landed in DIFFERENT splits — exactly how eval contamination
    * happens at scale (a test doc with a train-set near-copy). Composes
    * the verified MinHash pairs with the deterministic split assignment;
    * at 100 TB both sides are the operators already run, and the join is
    * on doc_id against the (tiny) pair list. The fix in production is
    * cluster-level splitting (route d06 clusters, not documents); this
    * operator is the audit that proves whether it's needed.
    */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh(s, dir).select("da", "db", "jaccard")
    val sp = splitAssign(s, dir)
    pairs
      .join(sp.select(col("doc_id").as("da"), col("split").as("split_a")), "da")
      .join(sp.select(col("doc_id").as("db"), col("split").as("split_b")), "db")
      .filter(col("split_a") =!= col("split_b"))
      .select("da", "db", "split_a", "split_b", "jaccard")
      .repartition(1).sortWithinPartitions("da", "db")
  }

  /** Train/val/test assignment (80/10/10) by id-hash bucket, with the
    * per-split document counts as the oracle-checked rollup. */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), hashBucket("doc_id"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .orderBy("split")

  /** Stratified deterministic sample: the k hash-smallest documents per
    * language — proportional-free, reproducible, and skew-proof (one
    * `WindowGroupLimit`-pruned top-k per stratum, never a full sort). */
  val PerStratum = 20

  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= PerStratum)
      .select("lang", "rk", "doc_id")
      .orderBy("lang", "rk")
  }
}
