package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — the rigor the reference lacks
  * (SURVEY §2.9: no watermarks, ordering assumed monotonic per partition;
  * spec mandates last-write-wins only). These are the engine's streaming
  * aggregation building blocks; each takes a streaming DataFrame with an
  * event-time column and returns a windowed aggregate safe to run with
  * state bounded by the watermark horizon.
  */
object WindowedAggs {

  /** Tumbling count+sum per window×key (update/append per output mode). */
  def tumbling(events: DataFrame, timeCol: String, watermark: String,
      windowLen: String, keyCol: String, valueCol: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol),
        col("n"), col("total"))

  /** Sliding window (length + slide interval). */
  def sliding(events: DataFrame, timeCol: String, watermark: String,
      windowLen: String, slide: String, keyCol: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"))

  /** Session window: events gapped less than `gap` merge into one session. */
  def session(events: DataFrame, timeCol: String, watermark: String,
      gap: String, keyCol: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))

  /** Stream-stream inner join within a time band (SURVEY §2.3 streaming
    * coverage): both sides watermarked so Spark can expire join state —
    * without the time-range condition the state store would grow without
    * bound. `maxDelay` is the band: right events join left events with
    * |t_r − t_l| inside [0, maxDelay).
    *
    * CONTRACT: `right` arrives with every column prefixed `r_` (e.g.
    * `right.toDF(right.columns.map("r_" + _): _*)`) so the two sides
    * never collide; `keyCol`/`leftTime` are LEFT names, `rightTime` is
    * the PREFIXED right-side name (it is referenced verbatim in the band
    * condition, which is why the builder cannot rename internally). The
    * requires turn a missed prefix into an immediate, named error
    * instead of an unresolved-column AnalysisException downstream.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTime: String, rightTime: String,
      watermark: String, maxDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(right.columns.contains(s"r_$keyCol"),
      s"right side must be pre-prefixed: expected column r_$keyCol in " +
        right.columns.mkString("[", ", ", "]"))
    require(right.columns.contains(rightTime),
      s"rightTime '$rightTime' must name a (prefixed) right-side column")
    left.withWatermark(leftTime, watermark)
      .join(right.withWatermark(rightTime, watermark),
        expr(s"""$keyCol = r_$keyCol AND
                 $rightTime >= $leftTime AND
                 $rightTime < $leftTime + interval $maxDelay"""),
        joinType)
  }

  /** Stream-stream LEFT OUTER band join — the "did a purchase follow
    * this view?" shape. Outer stream-stream joins are semantically
    * heavier than inner ones: an unmatched left row can only be emitted
    * (null-padded) once the watermark proves no matching right row can
    * still arrive, so results trail the watermark by design. Same
    * builder as [[streamStreamJoin]] — watermarks + the time band bound
    * the join state identically.
    */
  def streamStreamLeftJoin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTime: String, rightTime: String,
      watermark: String, maxDelay: String): DataFrame =
    streamStreamJoin(left, right, keyCol, leftTime, rightTime,
      watermark, maxDelay, joinType = "left_outer")

  /** Stream enriched by a static dimension (broadcast per micro-batch) —
    * the streaming-enrichment shape: no state, no watermark needed. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left")

  /** Streaming document dedup — the streaming face of the batch dedup
    * family (north-star): canonical-form fingerprint per document (same
    * normalization as `TextAnalysis.fingerprint`), then
    * `dropDuplicatesWithinWatermark` keyed on the fingerprint. State holds
    * one fingerprint per UNIQUE document inside the watermark horizon
    * (bounded, RocksDB-spillable) rather than per event — re-crawled or
    * re-ingested copies are dropped as they arrive, which is how a
    * training-data pipeline keeps an append-only corpus deduplicated
    * without nightly batch rewrites.
    */
  def streamingDocDedup(docs: DataFrame, textCol: String, timeCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("fp",
        md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
