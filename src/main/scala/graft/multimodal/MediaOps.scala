package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded-media feature row (top-level for encoder codegen). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int, features: Seq[Float])

/** A sampled frame (top-level for encoder codegen). */
case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample plumbing (builder spec: the actual
  * codec decode is STUBBED — this container ships no image/audio codecs —
  * while schema, partitioning, batch shape and everything downstream of
  * the decode is real and tested).
  *
  * Media table schema:
  * {{{
  * media_id LONG, kind STRING ('image'|'audio'|'video'),
  * bytes BINARY,
  * meta STRUCT<width INT, height INT, sample_rate INT, n_frames INT>
  * }}}
  *
  * Scale design: bytes never hit the driver — decode/feature-extract run
  * in `mapPartitions` over executor batches (the JVM analogue of
  * `mapInPandas` batch shape); features come out as `array<float>`
  * columns that feed the same ANN operators as the `embeddings` table
  * ([[graft.expr.NativeVecFns]], [[graft.functions.VecFns.rhpBucket]]).
  * Partitioning: repartition by `media_id` before decode so a hot
  * source file cannot skew one task.
  */
object MediaOps {

  val FeatureDim = 16

  /** Deterministic synthetic media table (no RNG — bytes derive from
    * sha2 of the id, expression-side). Stand-in for `spark.read.format
    * ("binaryFile")` over a real media lake. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("kind"),
      // 96 deterministic bytes: three chained sha2 rounds
      unhex(concat(
        sha2(conv(col("id"), 10, 16), 256),
        sha2(concat(conv(col("id"), 10, 16), lit("x")), 256),
        sha2(concat(conv(col("id"), 10, 16), lit("y")), 256))).as("bytes"),
      struct(
        (col("id") % 4 * 64 + 64).cast("int").as("width"),
        (col("id") % 3 * 64 + 64).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("id") % 7 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode: a real deployment replaces this body with a codec call
    * (e.g. javax.imageio / ffmpeg JNI) returning pixel/sample data. The
    * deterministic fake — a normalized 16-bin byte histogram — preserves
    * the contract: pure function of the bytes, fixed-dim float output. */
  def decodeToFeatures(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) / FeatureDim) += 1f
      i += 1
    }
    val n = bytes.length.toFloat
    var j = 0
    while (j < FeatureDim) { hist(j) /= n; j += 1 }
    hist
  }

  /** Distributed feature extraction: repartition by id (skew-proof), then
    * decode per executor batch. Output `features` is `array<float>` —
    * directly consumable by the ANN/similarity operators. */
  def imageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .repartition(col("media_id"))
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, bytes) =>
        MediaFeatures(id, kind, if (bytes == null) 0 else bytes.length,
          decodeToFeatures(bytes).toSeq)
      })
      .toDF()
  }

  /** Frame sampling for video rows: emit every `everyN`-th fixed-size
    * slice of the payload as a frame row (the STUB stands in for codec
    * frame extraction; the explode shape and schema are the real thing). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, everyN: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = if (bytes == null) 0 else bytes.length / frameBytes
        (0 until nFrames by everyN).map { f =>
          Frame(id, f, java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes))
        }
      }
      .toDF()
  }

  /** Metadata-level resize: a pure column transform (no pixel work in the
    * stub) that any real decoder would honor downstream. */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")))

  /** Near-dup buckets over media features — the multimodal tie-in to the
    * similarity operators: features → random-hyperplane LSH bucket. */
  def featureBuckets(features: DataFrame, nPlanes: Int = 8): DataFrame =
    features.withColumn("bucket",
      graft.functions.VecFns.rhpBucket(col("features"), FeatureDim, nPlanes))
}
