package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns with typed metadata, and
  * batch feature extraction via `mapPartitions` (the Scala analog of a
  * pandas-batch UDF: amortize per-batch setup — model load, codec init —
  * across an iterator of rows, never one-row-at-a-time).
  *
  * The actual byte decoding is STUBBED — this container has no image/audio
  * codecs — behind [[StubCodec]], a deterministic fake. The Spark-side
  * plumbing (schema, batch shape, partitioning) is real and tested.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long])

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      payload_sha: String,
      // STUB features — deterministic stand-ins for decoded outputs
      feature: Array[Float])

  /** ??? real decode goes here. STUB: deterministic pseudo-features from
    * the payload bytes so tests and downstream plumbing are exercisable.
    * A production build swaps this object for a codec-backed one with the
    * same signature (batch-in, batch-out). */
  object StubCodec {
    def decodeBatch(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
      // per-partition init happens HERE (once per batch, not per row) —
      // this is where a real codec/model handle would be opened
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { r =>
        digest.reset()
        val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
        val feat = Array.tabulate(8)(i =>
          (if (r.payload.isEmpty) 0f
           else r.payload(i % r.payload.length).toFloat / 127f))
        MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong, sha, feat)
      }
    }
  }

  /** Batch feature extraction: one codec/model init per partition, streamed
    * over the partition's rows — the scalable shape for 100 TB of media
    * (payloads never collect; partition sizing bounds memory). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(StubCodec.decodeBatch)
  }

  /** Synthesize a media table from any (id, text) DataFrame — payload =
    * UTF-8 bytes. Used by tests and the oracle-gated query (sha/byte-count
    * are recomputable in SQL). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit("image").as("media_type"),
        encode(col(textCol), "UTF-8").as("payload"),
        (col(idCol) % 1920).cast("int").as("width"),
        (col(idCol) % 1080).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }

  /** Frame-sampling shape for video rows: explode a payload into N frame
    * stubs (deterministic offsets) — the partition-preserving generator
    * pattern (`explode`, no shuffle). */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), coalesce(col("duration_ms"), lit(0L)), lit(everyMs))))

  /** Resize shape for image rows: fit-within-box target dimensions
    * (aspect-preserving, integer floor — the standard thumbnailing
    * contract) computed as pure column arithmetic, with the pixel work
    * itself stubbed through the same batch-codec seam as decode. Metadata
    * math stays in codegen; a production build swaps [[StubCodec]] for a
    * real scaler with the same batch signature. Rows without dimensions
    * pass through unresized (target = null). */
  def resizeTo(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scaleNum = least(lit(maxW.toLong) * col("height"),
      lit(maxH.toLong) * col("width"))
    // floor-divide both dims by the binding constraint; never upscale
    val tw = when(col("width").isNotNull && col("height").isNotNull &&
        col("width") > 0 && col("height") > 0,
      when(col("width") <= maxW && col("height") <= maxH, col("width"))
        .otherwise((scaleNum / col("height")).cast("int")))
    val th = when(col("width").isNotNull && col("height").isNotNull &&
        col("width") > 0 && col("height") > 0,
      when(col("width") <= maxW && col("height") <= maxH, col("height"))
        .otherwise((scaleNum / col("width")).cast("int")))
    media.withColumn("target_width", tw).withColumn("target_height", th)
  }
}
