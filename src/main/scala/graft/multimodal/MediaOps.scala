package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded-media feature row (top-level for encoder codegen). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int, features: Seq[Float])

/** A sampled frame (top-level for encoder codegen). */
case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

/** Typed media metadata (top-level for encoder codegen). */
case class MediaMeta(width: Int, height: Int, sample_rate: Int, n_frames: Int)

/** One media-lake row (top-level for encoder codegen). */
case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

/** A resized image row (top-level for encoder codegen). */
case class ResizedImage(media_id: Long, width: Int, height: Int, png: Array[Byte])

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing. Image (PNG) and audio (WAV/PCM16) decode is
  * REAL — pure-JVM container codecs in [[MediaCodec]], differentially
  * verified against `javax.imageio` — so only genuinely codec-less
  * payloads (video) take the byte-level fallback.
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

  /** Deterministic synthetic media lake with REAL container payloads,
    * generated executor-side (no driver loop, no RNG — everything is a
    * pure function of the id):
    *  - image rows: valid PNGs ([[MediaCodec.pngEncodeGray]]) whose
    *    IHDR dims equal the declared `meta` (spec-asserted),
    *  - audio rows: valid RIFF/PCM16 WAVs at `meta.sample_rate`,
    *  - video rows: opaque deterministic payload (sha-chained) — the one
    *    genuinely codec-less kind, decoded only at byte level.
    * Stand-in for `spark.read.format("binaryFile")` over a media lake. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].mapPartitions(_.map { id =>
      (id % 3) match {
        case 0 =>
          val w = (id % 4).toInt * 16 + 16
          val h = (id % 3).toInt * 16 + 16
          val px = Array.tabulate(w * h)(i => ((id * 31 + i * 7 + (i / w) * 13) & 0xff).toByte)
          MediaRow(id, "image", MediaCodec.pngEncodeGray(w, h, px), MediaMeta(w, h, 0, 0))
        case 1 =>
          // ~3% of audio rows (id % 30 == 4) are near-RETAKES of the
          // audio row three ids back: same source signal with 3 samples
          // dithered +64 — a sub-audible re-encode perturbation, the
          // fixture's genuine audio near-dup pairs (measured windowed-
          // energy L1 ≤ 6.7e-4 vs ≥ 1.46e-3 for distinct audio)
          val srcId = if (id % 30 == 4) id - 3 else id
          val ns = 200 + (srcId % 128).toInt
          val samples = Array.tabulate(ns)(i => (((srcId * 31 + i * 7919) % 65536) - 32768).toShort)
          if (id % 30 == 4) {
            var j = 0
            while (j < 3) {
              samples(j * 7) = math.min(32767, samples(j * 7) + 64).toShort; j += 1
            }
          }
          MediaRow(id, "audio", MediaCodec.wavEncodePcm16(16000, samples), MediaMeta(0, 0, 16000, 0))
        case _ =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val bytes = (0 until 3).flatMap { r =>
            md.reset(); md.digest(s"$id:$r".getBytes("UTF-8")).toSeq
          }.toArray
          MediaRow(id, "video", bytes, MediaMeta(0, 0, 0, (id % 7 + 1).toInt))
      }
    }).toDF()
  }

  /** Decode → fixed-dim float features, REAL for the formats the lake
    * carries: PNG rows inflate to actual pixels (16-bin intensity
    * histogram), WAV rows to actual PCM samples (16-window RMS-energy
    * envelope — time-structured, unlike a position-blind amplitude
    * histogram, so two different signals with the same sample
    * DISTRIBUTION still separate). Only codec-less payloads (video)
    * fall back to the byte-histogram — the documented stub tier, same
    * contract (pure function of bytes, fixed-dim output). */
  def decodeToFeatures(kind: String, bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return new Array[Float](FeatureDim)
    kind match {
      case "image" =>
        val (_, _, px) = MediaCodec.pngDecodeGray(bytes)
        histogram(px.length)(i => (px(i) & 0xff) / FeatureDim)
      case "audio" =>
        val (_, samples) = MediaCodec.wavDecodePcm16(bytes)
        audioEnergy(samples)
      case _ =>
        histogram(bytes.length)(i => (bytes(i) & 0xff) / FeatureDim)
    }
  }

  /** Windowed RMS-energy envelope: FeatureDim equal time windows
    * (window w covers sample range [w·n/D, (w+1)·n/D)), each mapped to
    * √(mean((s/32768)²)) ∈ [0, 1]. The standard cheap audio
    * fingerprint: amplitude-scale aware AND time-structured, robust to
    * a few dithered samples (each window averages ~n/16 samples). */
  private def audioEnergy(samples: Array[Short]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    val n = samples.length
    if (n == 0) return out
    var w = 0
    while (w < FeatureDim) {
      val a = w * n / FeatureDim
      val b = (w + 1) * n / FeatureDim
      if (b > a) {
        var acc = 0.0
        var i = a
        while (i < b) { val x = samples(i) / 32768.0; acc += x * x; i += 1 }
        out(w) = math.sqrt(acc / (b - a)).toFloat
      }
      w += 1
    }
    out
  }

  private def histogram(n: Int)(bin: Int => Int): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (n == 0) return hist
    var i = 0
    while (i < n) { hist(bin(i)) += 1f; i += 1 }
    var j = 0
    while (j < FeatureDim) { hist(j) /= n.toFloat; j += 1 }
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
          decodeToFeatures(kind, bytes).toSeq)
      })
      .toDF()
  }

  /** Header-only metadata extraction — the cheap whole-lake pass: PNG
    * IHDR dims / WAV sample rate parsed from the first bytes, no pixel
    * or sample inflation. */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, bytes) =>
        kind match {
          case "image" =>
            val (w, h) = MediaCodec.pngDims(bytes)
            (id, kind, w, h, 0)
          case "audio" =>
            (id, kind, 0, 0, MediaCodec.wavSampleRate(bytes))
          case _ => (id, kind, 0, 0, 0)
        }
      })
      .toDF("media_id", "kind", "width", "height", "sample_rate")
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

  /** REAL pixel-level image resize: PNG decode → nearest-neighbor
    * resample to (w, h) → PNG re-encode, per executor batch (bytes never
    * hit the driver; same `mapPartitions` batch shape as
    * [[imageFeatures]]). Nearest-neighbor (src index = ⌊dst·src/dst⌋) is
    * the standard thumbnail/tokenizer-grid resample and is exactly
    * reproducible — no float kernel, so the output bytes are
    * deterministic across engines and partitionings (spec: hand-computed
    * pixel map + `javax.imageio` differential on the re-encoded PNG).
    * Non-image rows are filtered out, not errored: a media lake always
    * carries mixed kinds. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, "target dims must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .repartition(col("media_id"))
      .select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (sw, sh, px) = MediaCodec.pngDecodeGray(bytes)
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          val srcRow = (y.toLong * sh / h).toInt * sw
          val dstRow = y * w
          var x = 0
          while (x < w) {
            out(dstRow + x) = px(srcRow + (x.toLong * sw / w).toInt)
            x += 1
          }
          y += 1
        }
        ResizedImage(id, w, h, MediaCodec.pngEncodeGray(w, h, out))
      }).toDF()
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
      graft.expr.NativeVecFns.rhpBucket(features.sparkSession, col("features"), nPlanes))

  /** Media near-dup DEDUP — the image/audio analogue of the q53 embedding
    * closure, and a first-class curation op (image dedup is standard
    * training-data practice): LSH-bucketed candidate pairs whose feature
    * histograms sit within `l1Threshold` form a graph; the star closure
    * labels every component with its minimum media id as canonical.
    *
    * L1 (not cosine) is the metric: decode histograms are near-uniform,
    * so cosine saturates ≥0.95 across the whole lake (measured) while L1
    * separates exact/near re-encodes (0 for pixel-identical content, a
    * measured ≥0.017 floor for distinct images) — same reasoning as
    * published image-dedup pipelines that threshold on histogram/pHash
    * distance, with [[graft.expr.FloatVecL1]] folding index-ordered so
    * the DuckDB twin is bit-identical.
    *
    * Pairs are SAME-KIND only (the kind joins alongside the bucket): a
    * "near-dup" between an image histogram and an audio envelope is
    * metric noise, and per-kind feature spaces carry per-kind
    * thresholds — image/video histograms use `l1Threshold`, audio
    * energy envelopes `kindThresholds("audio")` (0.001 sits mid-gap in
    * the measured audio pair distribution: retake pairs ≤ 6.7e-4,
    * distinct-signal floor 1.46e-3).
    *
    * 100 TB shape: pairs come only from the (bucket, kind) equi-join
    * (nPlanes is the [[graft.functions.VecFns.lshBitsFor]] corpus-size
    * knob), the L1 kernel is native codegen, and the closure is the
    * O(log²)-round star engine — no cross join anywhere (plan-asserted
    * in PlanQualitySpec). */
  def nearDupComponents(features: DataFrame, nPlanes: Int = 8,
                        l1Threshold: Double = 0.004,
                        kindThresholds: Map[String, Double] = Map("audio" -> 0.001)): DataFrame = {
    val spark = features.sparkSession
    val b = featureBuckets(features, nPlanes)
    val thr = kindThresholds.foldLeft(lit(l1Threshold): org.apache.spark.sql.Column) {
      case (acc, (k, t)) => when(col("kind") === k, lit(t)).otherwise(acc)
    }
    val lhs = b.select(col("bucket"), col("kind"), col("media_id").as("a_id"), col("features").as("a_f"))
    val rhs = b.select(col("bucket"), col("kind"), col("media_id").as("b_id"), col("features").as("b_f"))
    val pairs = lhs.join(rhs, Seq("bucket", "kind"))
      .filter(col("a_id") < col("b_id"))
      .filter(graft.expr.NativeVecFns.l1Dist(spark, col("a_f"), col("b_f")) < thr)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val verts = features.select(col("media_id").as("id"))
    graft.ml.ConnectedComponents.componentsStar(verts, pairs)
      .select(col("id").as("media_id"), col("component").as("canonical_id"),
        (col("id") =!= col("component")).as("is_duplicate"))
      .join(features.select(col("media_id"), col("kind")), Seq("media_id"))
      .select(col("media_id"), col("kind"), col("canonical_id"), col("is_duplicate"))
  }
}
