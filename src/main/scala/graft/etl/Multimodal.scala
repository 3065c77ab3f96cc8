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
  * dimensions plus an 8×8 downsampled-luma feature grid. Audio decoding is
  * REAL too: [[AudioCodec]] parses WAV/AIFF/AU PCM through
  * `javax.sound.sampled` and emits container metadata plus an 8-bucket RMS
  * energy envelope. Payloads neither codec understands (video containers,
  * corrupt bytes, or the text stand-ins some fixtures use) fall back to
  * [[StubCodec]]'s deterministic pseudo-features, so the batch pipeline
  * never throws on a bad byte stream — undecodable rows are identifiable
  * by `decoded_width IS NULL` / `sample_rate IS NULL`.
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
    * video, the one modality without a JDK-bundled codec. Same
    * batch-in/batch-out signature as [[ImageCodec]]. */
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
      val sha = graft.functions.Text.hexOf(digest.digest(r.payload))
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
          val sha = graft.functions.Text.hexOf(digest.digest(r.payload))
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

  /** Decoded audio features. Codec metadata is present iff the payload
    * really parsed as 16-bit PCM; `feature` is an 8-bucket RMS energy
    * profile of channel 0 in [0,1] (bucket b covers frames
    * ⌊b·n/8⌋..⌊(b+1)·n/8⌋ — the coarse loudness envelope used for
    * silence trimming and energy-based segment sampling). */
  final case class AudioFeatures(
      media_id: Long,
      n_bytes: Long,
      payload_sha: String,
      sample_rate: Option[Int],
      channels: Option[Int],
      n_frames: Option[Long],
      duration_ms: Option[Long],
      feature: Array[Float])

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM — pure-Java parsers, zero extra dependencies; the audio sibling
    * of [[ImageCodec]]'s ImageIO path). Emits the container's sample
    * rate / channel count / frame count / duration plus the 8-bucket RMS
    * envelope. Per-bucket mean-square accumulates in exact Longs (a
    * 16-bit sample squares to ≤ 2³⁰, so even 2³³ frames per bucket fit),
    * and only the final sqrt is floating — for fixtures whose samples
    * are ±amp the mean square is exactly amp², IEEE sqrt of a perfect
    * square is exact, and the oracle predicts the RMS analytically.
    * Payloads that aren't 16-bit signed PCM degrade to [[StubCodec]]
    * pseudo-features with null codec metadata — the task never throws on
    * a bad byte stream. */
  object AudioCodec {
    private val buckets = 8

    def decodeBatch(batch: Iterator[MediaRecord]): Iterator[AudioFeatures] = {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { r =>
        digest.reset()
        val sha = graft.functions.Text.hexOf(digest.digest(r.payload))
        val st =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        val fmt = if (st == null) null else st.getFormat
        if (fmt == null || fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
          val feat = Array.tabulate(buckets)(i =>
            if (r.payload.isEmpty) 0f
            else r.payload(i % r.payload.length).toFloat / 127f)
          AudioFeatures(r.media_id, r.payload.length.toLong, sha,
            None, None, None, None, feat)
        } else {
          val bytes = st.readAllBytes()
          val ch = fmt.getChannels
          val be = fmt.isBigEndian
          val nFrames = bytes.length / (2 * ch)
          val sums = new Array[Long](buckets)
          val cnts = new Array[Long](buckets)
          var i = 0
          while (i < nFrames) {
            val off = i * 2 * ch // channel 0 of each frame
            val s =
              (if (be) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
               else (bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            val b = ((i.toLong * buckets) / nFrames).toInt
            sums(b) += s.toLong * s
            cnts(b) += 1
            i += 1
          }
          val feat = Array.tabulate(buckets)(b =>
            if (cnts(b) == 0) 0f
            else (math.sqrt(sums(b).toDouble / cnts(b)) / 32768.0).toFloat)
          val sr = math.round(fmt.getSampleRate)
          AudioFeatures(r.media_id, r.payload.length.toLong, sha,
            Some(sr), Some(ch), Some(nFrames.toLong),
            Some(nFrames.toLong * 1000L / sr), feat)
        }
      }
    }
  }

  /** Per-row clipping/loudness integrity stats from REAL PCM decode —
    * the waveform-health screen an audio corpus runs before feature
    * extraction: clipped-sample count (|s| ≥ threshold), true peak, and
    * the exact DC sum (a nonzero DC offset flags a recording chain
    * fault). All three are exact integers over the decoded samples; only
    * decodable 16-bit PCM rows carry values, everything else reports
    * NULL frames loudly rather than fake zeros. */
  final case class AudioClipStats(
      media_id: Long,
      n_frames: Option[Long],
      n_clipped: Option[Long],
      peak: Option[Long],
      dc_sum: Option[Long])

  /** Scan-only `mapPartitions` decode (same batch seam as [[AudioCodec]]);
    * channel 0 of each frame, little/big-endian per the container. */
  def audioClipStats(media: Dataset[MediaRecord],
      clipThreshold: Int = 32000): Dataset[AudioClipStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val st =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
      val fmt = if (st == null) null else st.getFormat
      if (fmt == null || fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
        AudioClipStats(r.media_id, None, None, None, None)
      } else {
        val bytes = st.readAllBytes()
        val ch = fmt.getChannels
        val be = fmt.isBigEndian
        val nFrames = bytes.length / (2 * ch)
        var clipped = 0L; var peak = 0L; var dc = 0L
        var i = 0
        while (i < nFrames) {
          val off = i * 2 * ch
          val s =
            (if (be) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
             else (bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
          val a = math.abs(s.toLong)
          if (a >= clipThreshold) clipped += 1
          if (a > peak) peak = a
          dc += s
          i += 1
        }
        AudioClipStats(r.media_id, Some(nFrames.toLong), Some(clipped),
          Some(peak), Some(dc))
      }
    })
  }

  /** Per-row zero-crossing / periodicity stats from REAL PCM decode —
    * the cheap time-domain screen an audio corpus runs to separate
    * voiced/tonal content (low crossing rate) from noise or silence-gated
    * garbage (very high or near-zero rate) before any expensive feature
    * extraction. All fields are exact integers over the decoded samples:
    * `n_sign_changes` counts i ≥ 1 with (s_i ≥ 0) ≠ (s_{i−1} ≥ 0) — the
    * non-negative/negative convention is the pinned contract, so a
    * zero-valued sample sits on the non-negative side; `zcr_ppm` is the
    * floored rate per million sample transitions; `longest_run` is the
    * longest same-sign run (a direct half-period estimate for periodic
    * content); `energy_sum` is Σ s² (Long: 16-bit samples bound each term
    * by 2³⁰, safe past 10⁹ frames). Undecodable / non-PCM16 rows report
    * NULLs loudly, mirroring [[audioClipStats]]. */
  final case class AudioZcrStats(
      media_id: Long,
      n_frames: Option[Long],
      n_sign_changes: Option[Long],
      zcr_ppm: Option[Long],
      longest_run: Option[Long],
      energy_sum: Option[Long])

  /** Scan-only `mapPartitions` decode (same batch seam as [[AudioCodec]]);
    * channel 0 of each frame, little/big-endian per the container. */
  def audioZcr(media: Dataset[MediaRecord]): Dataset[AudioZcrStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val st =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
      val fmt = if (st == null) null else st.getFormat
      if (fmt == null || fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
        AudioZcrStats(r.media_id, None, None, None, None, None)
      } else {
        val bytes = st.readAllBytes()
        val ch = fmt.getChannels
        val be = fmt.isBigEndian
        val nFrames = bytes.length / (2 * ch)
        var changes = 0L; var run = 0L; var longest = 0L; var energy = 0L
        var prevNonNeg = false
        var i = 0
        while (i < nFrames) {
          val off = i * 2 * ch
          val s =
            (if (be) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
             else (bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
          val nonNeg = s >= 0
          if (i == 0 || nonNeg == prevNonNeg) run += 1
          else { if (run > longest) longest = run; changes += 1; run = 1 }
          prevNonNeg = nonNeg
          energy += s.toLong * s.toLong
          i += 1
        }
        if (run > longest) longest = run
        val zcr =
          if (nFrames > 1) changes * 1000000L / (nFrames - 1) else 0L
        AudioZcrStats(r.media_id, Some(nFrames.toLong), Some(changes),
          Some(zcr), Some(longest), Some(energy))
      }
    })
  }

  /** Stats of a REAL pixel resize: decode, resample to exactly
    * (targetW × targetH) with PINNED nearest-neighbor semantics —
    * src(x,y) = (⌊j·w/tw⌋, ⌊i·h/th⌋) — and fold the resized lumas into
    * exact integers (sum + two corners). The kernel is implemented here
    * rather than delegated to AWT's AffineTransformOp precisely so the
    * resample mapping is REPRODUCIBLE: production vision pipelines pin
    * their resize kernel for exactly this reason (a training corpus
    * resized under two kernels is two different corpora). Undecodable
    * rows report NULLs. */
  final case class ResizedStats(
      media_id: Long,
      src_w: Option[Long],
      src_h: Option[Long],
      out_w: Long,
      out_h: Long,
      luma_sum: Option[Long],
      luma00: Option[Long],
      luma_last: Option[Long])

  def resizeDecode(media: Dataset[MediaRecord], targetW: Int,
      targetH: Int): Dataset[ResizedStats] = {
    require(targetW >= 1 && targetH >= 1)
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false)
      batch.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        if (img == null)
          ResizedStats(r.media_id, None, None, targetW.toLong, targetH.toLong,
            None, None, None)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          def lumaAt(x: Int, y: Int): Long = {
            val rgb = img.getRGB(x, y)
            (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3L
          }
          var sum = 0L
          var i = 0
          while (i < targetH) {
            var j = 0
            while (j < targetW) {
              sum += lumaAt(j * w / targetW, i * h / targetH)
              j += 1
            }
            i += 1
          }
          ResizedStats(r.media_id, Some(w.toLong), Some(h.toLong),
            targetW.toLong, targetH.toLong, Some(sum), Some(lumaAt(0, 0)),
            Some(lumaAt((targetW - 1) * w / targetW,
              (targetH - 1) * h / targetH)))
        }
      }
    }
  }

  /** [[extractFeatures]]' audio twin: one codec init per partition,
    * streamed decode — same 100 TB batch shape, typed to
    * [[AudioFeatures]]. */
  def extractAudioFeatures(
      media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(AudioCodec.decodeBatch)
  }

  /** Encode a real PCM16 mono WAV square wave: every sample is +amp for
    * the first ⌈period/2⌉ frames of each period, −amp for the rest — so
    * EVERY sample squares to amp² and the RMS of any frame range is
    * exactly amp, which is what lets the decode oracle predict the
    * energy profile without parsing WAV itself (the audio analog of the
    * flat-gray PNG trick). */
  def syntheticWav(nFrames: Int, period: Int, amp: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (if (i % period < (period + 1) / 2) amp else -amp).toShort
      data(2 * i) = (s & 0xff).toByte // WAV PCM is little-endian
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Media table of REAL encoded WAVs, one per id: frame count, square
    * period, and amplitude are pure functions of the id (the
    * [[mediaFromSyntheticImages]] convention), so the oracle predicts
    * every decoded field analytically. Encoding runs inside the UDF —
    * distributed, no driver-side audio work. */
  def mediaFromSyntheticAudio(df: DataFrame,
      idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    val df_ = graft.etl.Parallelism.spread(df)
    val wavUdf = udf((id: Long) =>
      syntheticWav((800 + id % 5 * 160).toInt, (2 + id % 6).toInt,
        (1000 + id % 20 * 500).toInt))
    df_.select(
        col(idCol).cast("long").as("media_id"),
        lit("audio").as("media_type"),
        wavUdf(col(idCol).cast("long")).as("payload"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        expr(s"(800L + $idCol % 5 * 160) * 1000L div 8000L")
          .as("duration_ms"))
      .as[MediaRecord]
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
    val df_ = graft.etl.Parallelism.spread(df)
    val pngUdf = udf((id: Long) =>
      syntheticGradientPng((8 + id % 9).toInt, (8 + id % 5).toInt, id))
    df_.select(
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
    val df_ = graft.etl.Parallelism.spread(df)
    val pngUdf = udf((id: Long) =>
      syntheticPng((4 + id % 13).toInt, (3 + id % 7).toInt, (id % 251).toInt))
    df_.select(
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
    val df_ = graft.etl.Parallelism.spread(df)
    df_.select(
        col(idCol).cast("long").as("media_id"),
        lit("image").as("media_type"),
        encode(col(textCol), "UTF-8").as("payload"),
        (col(idCol) % 1920).cast("int").as("width"),
        (col(idCol) % 1080).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }

  /** Encode a real PCM16 mono WAV whose energy ALTERNATES between voiced
    * and silent 1/8-blocks: frame count is a multiple of 8, and block b
    * (0..7) carries the [[syntheticWav]] square wave iff bit b of
    * `pattern` is set, silence (all-zero samples) otherwise. Because the
    * blocks align exactly with [[AudioCodec]]'s 8 RMS envelope buckets
    * (bucket = i·8/nFrames), the decoded envelope is analytically
    * `amp` on voiced buckets and 0 on silent ones — the fixture that lets
    * a voice-activity oracle predict segmentation without parsing WAV. */
  def syntheticVadWav(nFrames: Int, period: Int, amp: Int, pattern: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    require(nFrames % 8 == 0, s"nFrames must be a multiple of 8: $nFrames")
    val data = new Array[Byte](nFrames * 2)
    val block = nFrames / 8
    var i = 0
    while (i < nFrames) {
      val voiced = ((pattern >> (i / block)) & 1) == 1
      val s =
        if (!voiced) 0.toShort
        else (if (i % period < (period + 1) / 2) amp else -amp).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Media table of VAD fixtures: voiced-block pattern `1 + id % 255`
    * (never all-silent), square period `2 + id % 6`, amplitude
    * `1000 + id % 20 · 500` — all pure functions of the id, same
    * convention as [[mediaFromSyntheticAudio]]. */
  def mediaFromSyntheticVadAudio(df: DataFrame,
      idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    val df_ = graft.etl.Parallelism.spread(df)
    val wavUdf = udf((id: Long) =>
      syntheticVadWav(800, (2 + id % 6).toInt, (1000 + id % 20 * 500).toInt,
        (1 + id % 255).toInt))
    df_.select(
        col(idCol).cast("long").as("media_id"),
        lit("audio").as("media_type"),
        wavUdf(col(idCol).cast("long")).as("payload"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(100L).as("duration_ms"))
      .as[MediaRecord]
  }

  /** Energy-threshold voice-activity segmentation over the decoded RMS
    * envelope — the distributed form of the classic VAD pass that
    * trims silence and counts speech segments before a corpus ships to
    * ASR/TTS training. A bucket is voiced when its quantized RMS
    * (round(rms·32768)) clears `thresholdQ`; consecutive voiced buckets
    * chain into one segment (run-length via the lag-mismatch window —
    * one shuffle on media_id, windows over the fixed 8-bucket envelope,
    * never over raw frames).
    *
    * Per media row: voiced bucket count, segment count, longest voiced
    * run, and the first voiced bucket index (0-based, -1 if silent). */
  def vadSegments(feats: DataFrame, thresholdQ: Long = 500L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_id")).orderBy(col("bucket"))
    val b = feats
      .select(col("media_id"), posexplode(col("feature")).as(Seq("bucket", "_rms")))
      .withColumn("_v",
        (round(col("_rms") * 32768).cast("long") > thresholdQ).cast("int"))
      .withColumn("_newSeg",
        when(col("_v") === 1 &&
          coalesce(lag(col("_v"), 1).over(w), lit(0)) === 0, 1).otherwise(0))
      .withColumn("_seg", sum(col("_newSeg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = b.filter(col("_v") === 1)
      .groupBy(col("media_id"), col("_seg"))
      .agg(count(lit(1)).as("_len"), min(col("bucket")).as("_start"))
    val agg = runs.groupBy(col("media_id"))
      .agg(sum(col("_len")).as("n_voiced"),
        count(lit(1)).as("n_segments"),
        max(col("_len")).as("longest_run"),
        min(col("_start")).cast("long").as("first_voiced"))
    feats.select(col("media_id")).distinct()
      .join(agg, Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"),
        coalesce(col("first_voiced"), lit(-1L)).as("first_voiced"))
  }

  /** Aspect-ratio bucket assignment over DECODED image dimensions — the
    * resolution-bucketing pass a vision-training pipeline runs so batches
    * share a shape (SDXL-style bucketed batching): each image goes to the
    * bucket whose aspect ratio is nearest its own, and the report carries
    * how much of the image a center-crop to the bucket's ratio keeps.
    *
    * Nearness is decided in integers: |w/h − wb/hb| ordering is preserved
    * under cross-multiplication by h·hb, so score = |w·hb − wb·h|·(L/hb)
    * (L = lcm of bucket heights) ranks buckets exactly; ties break to
    * list order via an (score, ord) struct min. kept_bp is the floored
    * pixel fraction a center-crop retains: (wb·h)/(hb·w) when the image
    * is wider than the bucket, (w·hb)/(wb·h) when taller.
    *
    * Scan + one combiner-friendly groupBy on the bucket label — no joins,
    * no windows; the bucket list is a compile-time literal folded into the
    * row expression, so the assignment is pure per-row codegen at any
    * scale. Buckets no image maps to are absent from the output. */
  def arBuckets(feats: DataFrame,
      buckets: Seq[(String, Int, Int)] = Seq(
        ("1:1", 1, 1), ("4:3", 4, 3), ("3:4", 3, 4),
        ("16:9", 16, 9), ("9:16", 9, 16))): DataFrame = {
    require(buckets.nonEmpty && buckets.forall(b => b._2 > 0 && b._3 > 0))
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmH = buckets.map(_._3.toLong).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val w = col("decoded_width").cast("long")
    val h = col("decoded_height").cast("long")
    val cand = array(buckets.zipWithIndex.map { case ((lbl, wb, hb), i) =>
      struct(
        (abs(w * hb - lit(wb.toLong) * h) * lit(lcmH / hb)).as("score"),
        lit(i).as("ord"), lit(lbl).as("bucket"),
        lit(wb.toLong).as("wb"), lit(hb.toLong).as("hb"))
    }: _*)
    feats
      .select(col("media_id"), w.as("w"), h.as("h"),
        array_min(cand).as("b"))
      .select(col("media_id"), col("w"), col("h"),
        col("b.bucket").as("bucket"), col("b.wb").as("wb"), col("b.hb").as("hb"))
      .withColumn("kept_bp",
        when(col("w") * col("hb") >= col("wb") * col("h"),
          expr("wb * h * 10000 div (hb * w)"))
        .otherwise(expr("w * hb * 10000 div (wb * h)")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("kept_bp")).as("sum_kept_bp"),
        min(col("kept_bp")).as("min_kept_bp"))
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
