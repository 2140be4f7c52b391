package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Det, Ids}

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed in batches.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `FakeCodec` produces deterministic features from the bytes. Everything
  * Spark-side is real and tested — schema, partitioning, batch shape,
  * and the mapPartitions batching contract (the JVM equivalent of a
  * `mapInPandas` Arrow-batch UDF: process a partition as a stream of
  * fixed-size batches, never materialize the partition, reuse buffers).
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
      feature: Array[Float], // decoded-feature embedding (stub)
      ok: Boolean,
      error: String)

  /** One synthetic media row — pure in (seed, i), shared by the distributed
    * synth and the single-threaded oracle dump (same differential pattern as
    * PageGen.page). */
  def mediaRow(i: Long, seed: Long = 42L): MediaRow = {
    val kind = Vector("image", "audio", "video")(Det.nextInt(Det.rand(seed, i, 1), 3))
    val len = 64 + Det.nextInt(Det.rand(seed, i, 2), 192)
    val bytes = Array.tabulate(len)(j => (Det.rand(seed, i, 3 + j) & 0xff).toByte)
    val w = 16 * (1 + Det.nextInt(Det.rand(seed, i, 4), 64))
    val h = 16 * (1 + Det.nextInt(Det.rand(seed, i, 5), 64))
    MediaRow(i, kind, bytes, w, h, 16000, 1000 + Det.nextInt(Det.rand(seed, i, 6), 60000))
  }

  /** Deterministic synthetic media table (no external data). */
  def synthMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n.toLong).map(i => mediaRow(i, seed))
  }

  /** STUB decoder: a real deployment replaces this one function with an
    * actual codec (JNI/FFI); the Spark plumbing around it is unchanged.
    * Deterministic: feature[d] = f(bytes, d). */
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
          try MediaFeature(m.media_id, m.kind, FakeCodec.decode(m.bytes), ok = true, null)
          catch {
            case e: Exception =>
              MediaFeature(m.media_id, m.kind, Array.empty, ok = false, e.getMessage)
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
