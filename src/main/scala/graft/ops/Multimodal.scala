package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Det, Ids}

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed in batches.
  *
  * The IMAGE path decodes for real: `ImageCodec` runs `javax.imageio`
  * (PNG/BMP/GIF in any stock JDK — zero external dependencies), and the
  * synthetic corpus carries genuine deterministic PNG payloads. The AUDIO
  * path ALSO decodes for real: `AudioCodec` runs `javax.sound.sampled`
  * (WAV/PCM in any stock JDK) over genuine deterministic 16-bit WAV
  * payloads, including deliberately-truncated ones that exercise the
  * per-row error isolation. Only VIDEO remains STUBBED (`FakeCodec` — no
  * stock-JDK video codec exists); a real deployment swaps that one function
  * for an FFI codec, the Spark plumbing around all three is identical and
  * tested — schema, partitioning, batch shape, and the mapPartitions
  * batching contract (the JVM equivalent of a `mapInPandas` Arrow-batch
  * UDF: process a partition as a stream of fixed-size batches, never
  * materialize the partition, reuse buffers).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int, height: Int,
      sampleRate: Int, durationMs: Int)

  case class MediaFeature(
      media_id: Long,
      kind: String,
      feature: Array[Float], // decoded-feature embedding (real for images)
      ok: Boolean,
      error: String)

  /** One synthetic media row — pure in (seed, i), shared by the distributed
    * synth and the single-threaded oracle dump (same differential pattern as
    * PageGen.page). Image rows carry a REAL deterministic PNG: pixel RGB is
    * a pure function of (seed, i, x, y), dims are capped small so encode
    * stays cheap; audio/video stay opaque deterministic bytes. */
  def mediaRow(i: Long, seed: Long = 42L): MediaRow = {
    val kind = Vector("image", "audio", "video")(Det.nextInt(Det.rand(seed, i, 1), 3))
    if (kind == "image") {
      val w = 8 * (1 + Det.nextInt(Det.rand(seed, i, 4), 6)) // 8..48 px
      val h = 8 * (1 + Det.nextInt(Det.rand(seed, i, 5), 6))
      MediaRow(i, kind, synthPng(i, seed, w, h), w, h, 0,
        1000 + Det.nextInt(Det.rand(seed, i, 6), 60000))
    } else if (kind == "audio") {
      // REAL 16-bit PCM WAV, written by the stock-JDK audio stack. 1 in 20
      // rows is truncated mid-header — a deliberately-broken payload the
      // per-row error isolation must absorb (ok=false), on BOTH the
      // distributed and the oracle side (same pure function).
      val n = 256 + Det.nextInt(Det.rand(seed, i, 2), 1792) // 256..2047 samples
      val wav = synthWav(i, seed, n, 16000)
      val bytes = if (Det.nextInt(Det.rand(seed, i, 9), 20) == 0) wav.take(16) else wav
      MediaRow(i, kind, bytes, 0, 0, 16000, n * 1000 / 16000)
    } else {
      val len = 64 + Det.nextInt(Det.rand(seed, i, 2), 192)
      val bytes = Array.tabulate(len)(j => (Det.rand(seed, i, 3 + j) & 0xff).toByte)
      val w = 16 * (1 + Det.nextInt(Det.rand(seed, i, 4), 64))
      val h = 16 * (1 + Det.nextInt(Det.rand(seed, i, 5), 64))
      MediaRow(i, kind, bytes, w, h, 16000, 1000 + Det.nextInt(Det.rand(seed, i, 6), 60000))
    }
  }

  /** Deterministic PNG payload: every pixel a pure function of
    * (seed, i, x, y), encoded by the stock-JDK PNG writer. */
  def synthPng(i: Long, seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = Det.rand(seed, i, 100L + y.toLong * w + x)
        img.setRGB(x, y, (r & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic WAV payload: 16-bit signed PCM mono, little-endian,
    * sample j a pure integer function of (seed, i, j) (white noise with a
    * per-row amplitude shift so RMS varies across rows), containerized by
    * the stock-JDK WAV writer — the exact inverse of [[AudioCodec.decode]]. */
  def synthWav(i: Long, seed: Long, nSamples: Int, rate: Int): Array[Byte] = {
    val shift = Det.nextInt(Det.rand(seed, i, 8), 8) // 0..7 -> full..1/128 scale
    val pcm = new Array[Byte](nSamples * 2)
    var j = 0
    while (j < nSamples) {
      val s = (((Det.rand(seed, i, 5000L + j) & 0xffff).toInt - 32768) >> shift).toShort
      pcm(2 * j) = (s & 0xff).toByte
      pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media table (no external data). */
  def synthMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n.toLong).map(i => mediaRow(i, seed))
  }

  /** REAL image decode via the stock JDK (`javax.imageio` reads PNG/BMP/GIF
    * everywhere, usually JPEG too — no external codec needed). Stats are
    * INTEGER-exact (channel sums + an 8-bin luminance histogram), so the
    * driver gate hash-compares them against the single-threaded oracle
    * re-derivation with no float tolerance. */
  object ImageCodec {
    final case class ImageStats(width: Int, height: Int,
                                sumR: Long, sumG: Long, sumB: Long,
                                hist: Array[Long]) // 8 luminance bins
    def decode(bytes: Array[Byte]): ImageStats = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) throw new IllegalArgumentException("not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          // integer BT.601 luma; 256/8 = 32-wide bins
          hist((r * 299 + g * 587 + b * 114) / 1000 / 32) += 1L
          x += 1
        }
        y += 1
      }
      ImageStats(w, h, sr, sg, sb, hist)
    }
    /** The mm1 feature view of a real decode: [w, h, meanR, meanG, meanB]
      * (means of ≤255 are float-exact enough for the driver's rounded f0;
      * f0 itself is the exact width). */
    def feature(bytes: Array[Byte]): Array[Float] = {
      val s = decode(bytes)
      val n = s.width.toLong * s.height
      Array(s.width.toFloat, s.height.toFloat,
        (s.sumR / n).toFloat, (s.sumG / n).toFloat, (s.sumB / n).toFloat)
    }
  }

  /** REAL audio decode via the stock JDK (`javax.sound.sampled` reads
    * WAV/PCM everywhere — no external codec needed). Stats are
    * INTEGER-exact (amplitude extrema, |x| and x² sums, sign crossings),
    * so the driver gate hash-compares them against the single-threaded
    * oracle re-derivation with no float tolerance; RMS is derivable
    * downstream as sqrt(sum_sq / n). Truncated/corrupt payloads throw
    * (the batching layer isolates them per-row). */
  object AudioCodec {
    final case class AudioStats(sampleRate: Int, nSamples: Int,
                                ampMin: Int, ampMax: Int,
                                sumAbs: Long, sumSq: Long, zeroCross: Int)
    def decode(bytes: Array[Byte]): AudioStats = {
      if (bytes == null || bytes.isEmpty) throw new IllegalArgumentException("empty payload")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes)) // BAIS supports mark/reset
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"unsupported audio format: $fmt")
        val pcm = ais.readAllBytes()
        require(pcm.length % 2 == 0 && pcm.length > 0, "empty/odd PCM payload")
        val n = pcm.length / 2
        var (mn, mx, zc) = (Int.MaxValue, Int.MinValue, 0)
        var (sAbs, sSq) = (0L, 0L)
        var prev = 0
        var j = 0
        while (j < n) {
          val lo = pcm(2 * j) & 0xff
          val hi = pcm(2 * j + 1).toInt // sign-carrying high byte
          val s = (hi << 8) | lo
          if (s < mn) mn = s
          if (s > mx) mx = s
          sAbs += math.abs(s).toLong
          sSq += s.toLong * s
          if (j > 0 && ((prev < 0) != (s < 0))) zc += 1
          prev = s
          j += 1
        }
        AudioStats(fmt.getSampleRate.toInt, n, mn, mx, sAbs, sSq, zc)
      } finally ais.close()
    }
    /** The mm1 feature view of a real decode: [n, zeroCross, min, max,
      * rate] — all integer-exact as floats. */
    def feature(bytes: Array[Byte]): Array[Float] = {
      val s = decode(bytes)
      Array(s.nSamples.toFloat, s.zeroCross.toFloat,
        s.ampMin.toFloat, s.ampMax.toFloat, s.sampleRate.toFloat)
    }
  }

  /** STUB decoder for video: a real deployment replaces this one
    * function with an actual codec (JNI/FFI); the Spark plumbing around it
    * is unchanged. Deterministic: feature[d] = f(bytes, d). */
  object FakeCodec {
    val Dim = 16
    def decode(bytes: Array[Byte]): Array[Float] = {
      if (bytes == null || bytes.isEmpty) throw new IllegalArgumentException("empty payload")
      val out = new Array[Float](Dim)
      var d = 0
      while (d < Dim) {
        var h = Ids.mix(d.toLong + 0x6d656469L)
        var i = d
        while (i < bytes.length) { h = Ids.mix(h ^ (bytes(i) & 0xffL)); i += Dim }
        out(d) = Det.nextDouble(h).toFloat
        d += 1
      }
      out
    }
  }

  val BatchSize = 64

  /** Decode dispatch: real `javax.imageio` for images, real
    * `javax.sound.sampled` for audio, stub for video — shared verbatim by
    * the distributed batches and the single-threaded oracle dump. */
  def decodeFeature(kind: String, bytes: Array[Byte]): Array[Float] =
    if (kind == "image") ImageCodec.feature(bytes)
    else if (kind == "audio") AudioCodec.feature(bytes)
    else FakeCodec.decode(bytes)

  /** Batched feature extraction: the partition iterator is consumed in
    * `BatchSize` groups (the Arrow-batch shape), each batch decoded together
    * — per-row errors isolated, never fatal (≙ per-unit error isolation,
    * `FunctionExporter.java:43-48`). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch-level setup would amortize codec init here
        batch.iterator.map { m =>
          try MediaFeature(m.media_id, m.kind, decodeFeature(m.kind, m.bytes), ok = true, null)
          catch {
            case e: Exception =>
              MediaFeature(m.media_id, m.kind, Array.empty, ok = false, e.getMessage)
          }
        }
      }
    }
  }

  case class ImageStatRow(
      media_id: Long, ok: Boolean,
      img_w: Int, img_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      lum0: Long, lum1: Long, lum2: Long, lum3: Long,
      lum4: Long, lum5: Long, lum6: Long, lum7: Long)

  /** Real per-image stats over the corpus's image rows — same batching
    * contract as [[extractFeatures]], integer-exact output (mm4's
    * driver-gated columns). Failed decodes keep the row (ok = false,
    * zeroed stats) so the gate also audits error isolation. */
  def imageStats(media: Dataset[MediaRow]): Dataset[ImageStatRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          try {
            val s = ImageCodec.decode(m.bytes)
            ImageStatRow(m.media_id, ok = true, s.width, s.height,
              s.sumR, s.sumG, s.sumB,
              s.hist(0), s.hist(1), s.hist(2), s.hist(3),
              s.hist(4), s.hist(5), s.hist(6), s.hist(7))
          } catch {
            case _: Exception =>
              ImageStatRow(m.media_id, ok = false, 0, 0, 0L, 0L, 0L,
                0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
    }
  }

  case class AudioStatRow(
      media_id: Long, ok: Boolean,
      sample_rate: Int, n_samples: Int,
      amp_min: Int, amp_max: Int,
      sum_abs: Long, sum_sq: Long, zero_cross: Int)

  /** Real per-clip audio stats over the corpus's audio rows — same batching
    * contract as [[extractFeatures]], integer-exact output (mm5's
    * driver-gated columns). The corpus's deliberately-truncated WAVs keep
    * their row (ok = false, zeroed stats) so the gate audits error
    * isolation on a path where failures genuinely occur. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStatRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          try {
            val s = AudioCodec.decode(m.bytes)
            AudioStatRow(m.media_id, ok = true, s.sampleRate, s.nSamples,
              s.ampMin, s.ampMax, s.sumAbs, s.sumSq, s.zeroCross)
          } catch {
            case _: Exception =>
              AudioStatRow(m.media_id, ok = false, 0, 0, 0, 0, 0L, 0L, 0)
          }
        }
      }
    }
  }

  /** Resize plan (image path): pure metadata transform — compute target
    * dims server-side without touching bytes (column pruning keeps the
    * binary column unread when only dims are selected). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.select(col("media_id"), col("width"), col("height"),
      when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
        .otherwise(lit(maxSide).cast("double") / greatest(col("width"), col("height")))
        .as("scale"))
      // least(maxSide): ceil of the double product can round to maxSide+1
      // (e.g. 151 * (100/151) = 100.0000...01) — the cap must win. A
      // scale of 1.0 keeps dims <= maxSide by construction, so capping at
      // maxSide is exact for both sides.
      .withColumn("target_w",
        least(ceil(col("width") * col("scale")), lit(maxSide)).cast("int"))
      .withColumn("target_h",
        least(ceil(col("height") * col("scale")), lit(maxSide)).cast("int"))

  /** Frame-sampling plan (video path): deterministic frame indices from
    * duration — `sequence` + `transform`, no UDF. */
  def frameSamplePlan(media: DataFrame, everyMs: Int): DataFrame =
    media.filter(col("kind") === "video" && col("durationMs") > 0)
      .select(col("media_id"), col("durationMs"),
        sequence(lit(0), col("durationMs") - 1, lit(everyMs)).as("frame_ts_ms"))
      .withColumn("n_frames", size(col("frame_ts_ms")))
}
