package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns with typed metadata, and
  * batch feature extraction via `mapPartitions` (the Scala analog of a
  * pandas-batch UDF: amortize per-batch setup — model load, codec init —
  * across an iterator of rows, never one-row-at-a-time).
  *
  * Image decoding is REAL: [[ImageCodec]] decodes PNG/BMP/GIF/JPEG through
  * the JDK's `javax.imageio` (pure-Java, no native libs) and emits actual
  * dimensions plus an 8×8 downsampled-luma feature grid. Payloads ImageIO
  * cannot decode (audio/video containers, corrupt bytes, or the text
  * stand-ins some fixtures use) fall back to [[StubCodec]]'s deterministic
  * pseudo-features, so the batch pipeline never throws on a bad byte
  * stream — undecodable rows are identifiable by `decoded_width IS NULL`.
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

  /** Decoded features. `decoded_width`/`decoded_height` are present iff
    * the payload really decoded (vs the stub fallback); `feature` is the
    * codec's vector — 64 luma cells for decoded images, 8 pseudo-floats
    * from the stub. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      payload_sha: String,
      decoded_width: Option[Int],
      decoded_height: Option[Int],
      feature: Array[Float])

  /** Deterministic pseudo-features from the payload bytes — the fallback
    * for payloads no installed codec understands, and the stand-in for
    * modalities (audio/video) whose codecs aren't bundled with the JDK.
    * Same batch-in/batch-out signature as [[ImageCodec]]. */
  object StubCodec {
    def decodeBatch(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
      // per-partition init happens HERE (once per batch, not per row) —
      // this is where a real codec/model handle would be opened
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      batch.map(r => stubOne(digest, r))
    }
    private[Multimodal] def stubOne(digest: java.security.MessageDigest,
        r: MediaRecord): MediaFeatures = {
      digest.reset()
      val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
      val feat = Array.tabulate(8)(i =>
        (if (r.payload.isEmpty) 0f
         else r.payload(i % r.payload.length).toFloat / 127f))
      MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong, sha,
        None, None, feat)
    }
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG —
    * all pure-Java readers, zero extra dependencies). Emits the decoded
    * dimensions and an 8×8 grid of luma samples in [0,1] (row-major;
    * cell (i,j) samples pixel (⌊j·w/8⌋, ⌊i·h/8⌋) — nearest-pixel
    * downsampling, exact and deterministic for any image size, including
    * images smaller than the grid). Luma = (r+g+b)/3 — integer mean, so
    * a flat-gray fixture round-trips bit-exactly through encode→decode.
    *
    * Batch shape: disk caching is disabled (ImageIO's default spills
    * temp files — wrong on executors), decode streams row-by-row off the
    * iterator, and a payload that fails to decode degrades to
    * [[StubCodec]] features instead of failing the task. */
  object ImageCodec {
    private val grid = 8

    def decodeBatch(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      javax.imageio.ImageIO.setUseCache(false) // no temp-file spill on executors
      batch.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        if (img == null) StubCodec.stubOne(digest, r)
        else {
          digest.reset()
          val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
          val (w, h) = (img.getWidth, img.getHeight)
          val feat = new Array[Float](grid * grid)
          var i = 0
          while (i < grid) {
            var j = 0
            while (j < grid) {
              val rgb = img.getRGB(j * w / grid, i * h / grid)
              val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              feat(i * grid + j) = luma / 255f
              j += 1
            }
            i += 1
          }
          MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
            sha, Some(w), Some(h), feat)
        }
      }
    }
  }

  /** Batch feature extraction: one codec/model init per partition, streamed
    * over the partition's rows — the scalable shape for 100 TB of media
    * (payloads never collect; partition sizing bounds memory). Defaults to
    * the real [[ImageCodec]]; pass a different batch decoder for other
    * modalities. */
  def extractFeatures(media: Dataset[MediaRecord],
      decode: Iterator[MediaRecord] => Iterator[MediaFeatures] =
        ImageCodec.decodeBatch): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decode)
  }

  /** Encode a real flat-gray PNG (TYPE_INT_RGB, every pixel = `gray` on
    * all three channels) — the fixture generator for decode tests and the
    * oracle-gated decode query: dimensions and mean luma are analytically
    * predictable from the arguments while the bytes exercise the full
    * ImageIO encode→decode round trip. */
  def syntheticPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = gray & 0xff
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a real gradient PNG: pixel (x, y) holds gray
    * `(7x + 3y + seed) mod 251` on all channels — structured content
    * whose every pixel an oracle can predict analytically, which is what
    * a perceptual-hash test needs (a flat image has an all-zero
    * gradient hash). */
  def syntheticGradientPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = (((7L * x + 3L * y + seed) % 251 + 251) % 251).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Gradient-PNG media table (the [[mediaFromSyntheticImages]] sibling
    * with per-pixel structure): w = 8 + id%9, h = 8 + id%5, seed = id —
    * all pure functions of the id so the oracle can reconstruct any
    * sampled pixel. */
  def mediaFromSyntheticGradientImages(df: DataFrame,
      idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    val pngUdf = udf((id: Long) =>
      syntheticGradientPng((8 + id % 9).toInt, (8 + id % 5).toInt, id))
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit("image").as("media_type"),
        pngUdf(col(idCol).cast("long")).as("payload"),
        (lit(8) + col(idCol) % 9).cast("int").as("width"),
        (lit(8) + col(idCol) % 5).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }

  /** Difference hash (dHash) of a decoded 8×8 luma grid: bit (i, j) is
    * set iff cell (i, j+1) is strictly brighter than cell (i, j) — 7
    * comparisons × 8 rows packed row-major into a 56-bit long. The
    * standard near-duplicate IMAGE signature: resize-, brightness- and
    * compression-robust, pairable with the native `hamming` expression
    * the text SimHash path already uses. Luma cells are recovered as
    * exact integers (`round(f·255)` inverts the codec's `luma/255f`), so
    * the hash is bit-stable cross-engine. Pure column arithmetic over
    * the feature array — no UDF, no shuffle. */
  def dhash(featureCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def lum(k: Int) = round(element_at(featureCol, k + 1) * 255).cast("long")
    (for { i <- 0 until 8; j <- 0 until 7 } yield
      when(lum(i * 8 + j + 1) > lum(i * 8 + j), lit(1L << (i * 7 + j)))
        .otherwise(lit(0L))).reduce(_ + _)
  }

  /** Media table of REAL encoded PNGs, one per input id: dimensions and
    * fill gray are pure functions of the id (w = 4 + id%13, h = 3 + id%7,
    * gray = id%251) so an oracle can predict the decoded metadata without
    * being able to decode PNG itself. Encoding runs distributed inside the
    * UDF — no driver-side image work. */
  def mediaFromSyntheticImages(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    val pngUdf = udf((id: Long) =>
      syntheticPng((4 + id % 13).toInt, (3 + id % 7).toInt, (id % 251).toInt))
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit("image").as("media_type"),
        pngUdf(col(idCol).cast("long")).as("payload"),
        (lit(4) + col(idCol) % 13).cast("int").as("width"),
        (lit(3) + col(idCol) % 7).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
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
