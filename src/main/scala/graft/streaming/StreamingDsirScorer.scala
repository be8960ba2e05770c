package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.operators.{Sampling, TextPrep}

/** Online DSIR scoring — the streaming consumer of the p19 trained
  * artifact ([[graft.operators.Sampling.dsirBucketClasses]]): the batch
  * trainer fits the 64-row bucket→class table once per corpus snapshot;
  * this scorer folds it into a LITERAL map expression and scores every
  * arriving document in a single stateless projection — token hash →
  * bucket → class lookup → sum — so admission decisions (`keep`) happen
  * the moment a crawled document lands, with bit-identical scores to
  * the batch `dsirWeighting` pass.
  *
  * Scale shape: NO state, NO shuffle, NO stream-static join — the
  * artifact rides inside the plan as a 64-entry map literal
  * (`element_at` over codegen'd built-ins), so the operator chains onto
  * any ingest stream at wire speed and re-deploys by restarting with a
  * freshly-trained table. The class arithmetic already happened at
  * train time; scoring is integer adds.
  */
object StreamingDsirScorer {

  /** The scoring projection over a `(doc_id, lang, text)` frame — works
    * identically on a stream or a batch frame (the parity proof in the
    * spec runs both). `classes` is the trained (bucket → class) table,
    * densified over all buckets by the trainer. */
  def score(docs: DataFrame, classes: Map[Long, Int]): DataFrame = {
    require(classes.keySet == (0L until Sampling.DsirBuckets).toSet,
      s"classes must cover all ${Sampling.DsirBuckets} buckets")
    val classMap = map(classes.toSeq.sortBy(_._1).flatMap {
      case (b, c) => Seq(lit(b), lit(c.toLong)) }: _*)
    val toks = TextPrep.tokens(col("text"))
    val points = aggregate(
      transform(toks, t => element_at(classMap, Sampling.dsirBucket(t))),
      lit(0L), (acc: Column, x: Column) => acc + x)
    // null-text docs produce zero rows from the batch pass's explode —
    // drop them here too or the stream would emit a decision the
    // offline pass never made
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
      size(toks).cast("long").as("n_tokens"), points.as("dsir_points"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("dsir_points"),
        when(col("dsir_points") > 0, 1).otherwise(0).as("keep"),
        (col("dsir_points").cast(DoubleType) / col("n_tokens"))
          .as("mean_class"))
  }

  /** Collect the trained artifact into the literal-map form the scorer
    * embeds. 64 rows — the one deliberate driver-side collect, of the
    * MODEL, not the data (the same move as broadcasting any trained
    * parameter table). */
  def trainedClasses(classed: DataFrame): Map[Long, Int] =
    classed.select("bucket", "cls").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
}
