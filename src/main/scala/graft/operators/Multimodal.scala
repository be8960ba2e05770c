package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition (north-star surface).
  *
  * This container has no image/audio codecs, so [[DecodeStub.decode]] is a
  * clearly-marked deterministic FAKE standing in for e.g. a JPEG decoder —
  * everything around it (schema, Dataset encoders, mapPartitions batch
  * shape, partition sizing) is the real distributed plumbing a decoder
  * would plug into. In PySpark terms this is the `mapInPandas` slot; in
  * Scala the idiomatic equivalent is `Dataset.mapPartitions` so decoder
  * instances are reused per partition, not per row.
  */
object Multimodal {

  /** One media asset: id + opaque payload + envelope metadata. */
  final case class MediaAsset(doc_id: Long, payload: Array[Byte],
      media_type: String)

  /** Typed decode output. */
  final case class MediaFeatures(doc_id: Long, media_type: String,
      byte_len: Int, width: Int, height: Int, n_frames: Int,
      histogram: Array[Double])

  object DecodeStub {
    /** FAKE decode — deterministic stand-in for a real codec.
      * Real implementation would parse the container format; the stub
      * derives "dimensions" from payload length and a 16-bin byte
      * histogram as the "feature vector". */
    def decode(a: MediaAsset): MediaFeatures = {
      val len = a.payload.length
      val hist = new Array[Double](16)
      a.payload.foreach(b => hist((b & 0xff) >> 4) += 1)
      val total = math.max(1, len).toDouble
      MediaFeatures(a.doc_id, a.media_type, len,
        width = len % 640, height = len % 480, n_frames = len % 30,
        histogram = hist.map(_ / total))
    }
  }

  /** The corpus has no binary media table, so assets are synthesized from
    * document text bytes — the payload is opaque to everything downstream,
    * exactly as real media bytes would be. */
  def assets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        concat(lit("fake/"),
          element_at(array(lit("jpeg"), lit("png"), lit("webp")),
            (col("doc_id") % 3 + 1).cast("int"))).as("media_type"))
      .as[MediaAsset]
  }

  /** Distributed decode: one decoder per partition (mapPartitions), typed
    * output, no driver involvement. */
  def decodeAll(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup slot (real codec init would go here)
      it.map(DecodeStub.decode)
    }
  }

  /** Resize: nearest-neighbor resample of the opaque payload to a fixed
    * target length — the partition shape (not the codec) of image resizing
    * for model input: constant-size output vector per asset, computed
    * executor-side with no driver involvement. A real implementation swaps
    * the index arithmetic for a pixel-grid interpolation. */
  def resize(assets: Dataset[MediaAsset], target: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val len = a.payload.length
      val out = Array.tabulate(target)(i =>
        if (len == 0) 0 else a.payload((i.toLong * len / target).toInt) & 0xff)
      (a.doc_id, target, out)
    }.toDF("doc_id", "size", "pixels")
  }

  /** Frame sampling: every k-th byte as a "frame" marker — the partition
    * and batch shape of real video frame extraction. */
  def sampleFrames(assets: Dataset[MediaAsset], everyK: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      a.payload.indices.by(everyK).map(i =>
        (a.doc_id, i, a.payload(i).toInt & 0xff))
    }.toDF("doc_id", "frame_offset", "frame_byte")
  }

  /** Driver-checkable resize: the [[resize]] plumbing with the pixel
    * vector JSON-serialized (raw arrays are unhashable in the driver's
    * compare — the q21 lesson). The corpus text is ASCII, so the oracle
    * reproduces payload bytes with ord(substr(...)). */
  def resizeQuery(s: SparkSession, dir: String): DataFrame =
    resize(assets(s, dir), target = 64)
      .select(col("doc_id"), col("size"),
        to_json(col("pixels")).as("pixels_json"))
      .orderBy("doc_id")

  /** Driver-checkable frame sampling: every 10th payload byte. */
  def frameSampleQuery(s: SparkSession, dir: String): DataFrame =
    sampleFrames(assets(s, dir), everyK = 10)
      .orderBy("doc_id", "frame_offset")

  /** Driver-checkable 16-bin byte histogram — the [[DecodeStub.decode]]
    * feature vector as pure column expressions: explode payload bytes
    * (ASCII corpus ⇒ ord == byte), bin by the high nibble, one conditional
    * aggregation per doc. Counts (exact integers) ship as JSON with the
    * length alongside — the normalized fractions are counts/len, but
    * double JSON formatting is engine-specific while integer JSON is not. */
  def histogramQuery(s: SparkSession, dir: String): DataFrame = {
    val bytes = Tables.table(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("len"),
        explode(split(col("text"), "")).as("ch"))
      // Java split(_, -1) keeps a trailing empty string — drop it
      .filter(col("ch") =!= "")
      .select(col("doc_id"), col("len"),
        (ascii(col("ch")).cast("int") / 16).cast("int").as("bin"))
    val bins = (0 until 16).map(b =>
      sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"b$b"))
    bytes.groupBy(col("doc_id"), col("len"))
      .agg(bins.head, bins.tail: _*)
      .select(col("doc_id"), col("len"),
        to_json(array((0 until 16).map(b => col(s"b$b")): _*))
          .as("hist_counts_json"))
      .orderBy("doc_id")
  }

  /** Perceptual-hash (aHash) visual dedup — the multimodal twin of d01:
    * resample every payload to 64 "pixels" (the [[resize]] grid), set
    * bit_i when pixel_i exceeds the mean, and group identical 64-bit
    * fingerprints. The mean comparison is the exact integer form
    * `pixel_i · 64 > Σ pixels` (a float mean would put boundary pixels at
    * the mercy of rounding). Real aHash runs on decoded luma — the stub
    * payload stands in, the dataflow (constant-size fingerprint per
    * asset, hash-shuffle group) is the 100-TB shape. Near-dup variants
    * band the 64 bits exactly like d05 bands its hyperplane signs. */
  def perceptualHashQuery(s: SparkSession, dir: String): DataFrame = {
    val px = resize(assets(s, dir), target = 64)
    px.select(col("doc_id"), col("pixels"),
        aggregate(col("pixels"), lit(0L), (a, x) => a + x).as("st"))
      .select(col("doc_id"),
        array_join(transform(col("pixels"),
          p => when(p * 64 > col("st"), "1").otherwise("0")), "").as("ahash"))
      .groupBy("ahash")
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_assets"))
      .select(col("rep_id"), col("n_assets"), col("ahash"))
      .orderBy("rep_id")
  }

  /** Oracle-checkable metadata query: byte length + stub-decoded dims via
    * pure column expressions (same formulas as [[DecodeStub.decode]]). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).as("byte_len"))
      .select(col("doc_id"), col("byte_len"),
        (col("byte_len") % 640).as("width"),
        (col("byte_len") % 480).as("height"),
        (col("byte_len") % 30).as("n_frames"),
        element_at(array(lit("jpeg"), lit("png"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")).as("fmt"))
      .orderBy("doc_id")

  /** Still-segment / silence detection — the media-curation pass that
    * finds the longest constant-byte run per payload (static frames in
    * video, silence in PCM audio; a long run means droppable or
    * compressible content). Classic gaps-and-islands: position minus
    * per-(doc, value) rank is constant within a run, one aggregation
    * per run, then an argmax per asset (longest run; ties to the
    * smallest byte, then earliest offset — fully deterministic). Runs
    * shuffle keyed by (doc, byte): parallelism scales with assets ×
    * byte diversity at any corpus size.
    */
  def stillSegmentsQuery(s: SparkSession, dir: String): DataFrame = {
    val bytes = Tables.spread(s, dir, "documents", "doc_id")
      .select(col("doc_id"), posexplode(split(col("text"), "")))
      // Java split keeps a trailing empty string — drop it
      .filter(col("col") =!= "")
      .select(col("doc_id"), col("pos"), ascii(col("col")).cast("int").as("v"))
    val w = Window.partitionBy(col("doc_id"), col("v")).orderBy(col("pos"))
    val runs = bytes
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("v"), col("grp"))
      .agg(count(lit(1)).as("run_len"), min(col("pos")).as("run_start"))
    runs.groupBy("doc_id").agg(
      count(lit(1)).as("n_runs"),
      max(struct(col("run_len"), (-col("v")).as("nv"),
        (-col("run_start")).as("ns"))).as("best"))
      .select(col("doc_id"), col("n_runs"),
        col("best.run_len").as("max_run_len"),
        (-col("best.nv")).as("max_run_byte"),
        (-col("best.ns")).as("max_run_start"))
      .orderBy("doc_id")
  }
}
