package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaOpsSpec extends SparkSpec {

  test("synthetic media: deterministic payloads, typed metadata, real containers per kind") {
    val m1 = MediaOps.syntheticMedia(spark, 21).orderBy("media_id").collect()
    val m2 = MediaOps.syntheticMedia(spark, 21).orderBy("media_id").collect()
    assert(m1.map(_.getAs[Array[Byte]]("bytes").toSeq).toSeq ==
      m2.map(_.getAs[Array[Byte]]("bytes").toSeq).toSeq)
    m1.foreach { r =>
      val kind = r.getAs[String]("kind")
      val bytes = r.getAs[Array[Byte]]("bytes")
      val meta = r.getStruct(r.fieldIndex("meta"))
      kind match {
        case "image" =>
          // declared meta must equal the REAL IHDR header dims
          val (w, h) = MediaCodec.pngDims(bytes)
          assert(w == meta.getAs[Int]("width") && h == meta.getAs[Int]("height"))
        case "audio" =>
          assert(MediaCodec.wavSampleRate(bytes) == meta.getAs[Int]("sample_rate"))
        case "video" =>
          assert(bytes.length == 96) // three sha-256 rounds
      }
    }
  }

  test("feature extraction: fixed dim, normalized, deterministic, distributed schema") {
    val media = MediaOps.syntheticMedia(spark, 50)
    val f = MediaOps.imageFeatures(media)
    assert(f.schema("features").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false))
    val rows = f.orderBy("media_id").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("features")
      assert(v.length == MediaOps.FeatureDim)
      r.getAs[String]("kind") match {
        // image/video features are normalized histograms; audio features
        // are per-window RMS energies (each in [0,1], not summing to 1)
        case "audio" => assert(v.forall(x => x >= 0f && x <= 1f) && v.sum > 0f)
        case _ => assert(math.abs(v.sum - 1.0f) < 1e-4, "histogram must be normalized")
      }
    }
    // deterministic across runs
    val again = MediaOps.imageFeatures(media).orderBy("media_id").collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("features")).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("features")).toSeq)
  }

  test("image features come from REAL decoded pixels (not container bytes)") {
    val w = 16; val h = 16
    val px = Array.tabulate(w * h)(i => (i % 256).toByte)
    val png = MediaCodec.pngEncodeGray(w, h, px)
    val fromPixels = MediaOps.decodeToFeatures("image", png)
    // expected: histogram of the PIXELS, not of the compressed container
    val expected = new Array[Float](MediaOps.FeatureDim)
    px.foreach(p => expected((p & 0xff) / MediaOps.FeatureDim) += 1f / px.length)
    assert(fromPixels.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    // and the container-byte histogram would differ (deflate scrambles)
    val containerHist = MediaOps.decodeToFeatures("video", png)
    assert(fromPixels.toSeq != containerHist.toSeq)
  }

  test("decode: pure function of bytes, empty-safe") {
    val a = MediaOps.decodeToFeatures("video", Array[Byte](0, 1, 2, 3))
    val b = MediaOps.decodeToFeatures("video", Array[Byte](0, 1, 2, 3))
    assert(a.toSeq == b.toSeq)
    assert(MediaOps.decodeToFeatures("image", Array.empty).toSeq == Seq.fill(16)(0f))
  }

  test("header-only metadata pass parses real container headers") {
    val meta = MediaOps.extractMeta(MediaOps.syntheticMedia(spark, 30)).collect()
    meta.filter(_.getAs[String]("kind") == "image").foreach { r =>
      assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("height") >= 16)
    }
    meta.filter(_.getAs[String]("kind") == "audio").foreach { r =>
      assert(r.getAs[Int]("sample_rate") == 16000)
    }
  }

  test("frame sampling: every-Nth fixed slice of video payloads only") {
    val media = MediaOps.syntheticMedia(spark, 30)
    val frames = MediaOps.sampleFrames(media, frameBytes = 16, everyN = 2)
    val nVideos = media.filter(col("kind") === "video").count()
    // 96 bytes / 16 = 6 frames, every 2nd → 3 per video
    assert(frames.count() == nVideos * 3)
    assert(frames.select("frame_idx").distinct().collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.collect().forall(_.getAs[Array[Byte]]("frame_bytes").length == 16))
  }

  test("features feed the similarity operators (LSH bucketing)") {
    val f = MediaOps.imageFeatures(MediaOps.syntheticMedia(spark, 40))
    val b = MediaOps.featureBuckets(f)
    val buckets = b.select("bucket").collect().map(_.getLong(0))
    assert(buckets.forall(x => x >= 0 && x < 256))
  }

  test("audio retake pairs dedup under the energy envelope; distinct audio stays distinct") {
    // the fixture lake's audio near-dups: id % 30 == 4 is a 3-sample
    // dithered retake of id-3 — nearDupComponents must merge exactly
    // those pairs on the audio side, at the audio threshold, same-kind
    val media = MediaOps.syntheticMedia(spark, 300)
    val out = MediaOps.nearDupComponents(MediaOps.imageFeatures(media))
      .filter(col("kind") === "audio").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val retakes = (0L until 300L).filter(id => id % 3 == 1 && id % 30 == 4)
    assert(retakes.nonEmpty)
    for (id <- retakes) {
      assert(out(id) == (id - 3, true), s"retake $id must dedup to ${id - 3}: ${out(id)}")
      assert(out(id - 3) == (id - 3, false), s"base ${id - 3} must stay canonical")
    }
    // every non-retake audio row keeps itself as canonical
    for ((id, (canon, dup)) <- out if !retakes.contains(id) && !retakes.contains(id + 3))
      assert(canon == id && !dup, s"distinct audio $id must not merge: ($canon, $dup)")
  }

  test("windowed energy separates same-distribution signals a position-blind histogram cannot") {
    // a signal and its reverse share the amplitude DISTRIBUTION exactly;
    // the energy envelope must still tell them apart when their power is
    // time-localized (front-loaded burst vs back-loaded burst)
    val n = 320
    val burst = Array.tabulate(n)(i => if (i < n / 4) 20000 else 100).map(_.toShort)
    val wavA = MediaCodec.wavEncodePcm16(16000, burst)
    val wavB = MediaCodec.wavEncodePcm16(16000, burst.reverse)
    val fa = MediaOps.decodeToFeatures("audio", wavA)
    val fb = MediaOps.decodeToFeatures("audio", wavB)
    val l1 = fa.zip(fb).map { case (x, y) => math.abs(x - y) }.sum
    assert(l1 > 0.5, s"time-reversed burst must be far in envelope space, L1=$l1")
  }

  test("resizeMeta: metadata transform preserves other fields") {
    val m = MediaOps.resizeMeta(MediaOps.syntheticMedia(spark, 5), 224, 224)
    val meta = m.select("meta.*").collect()
    assert(meta.forall(r => r.getAs[Int]("width") == 224 && r.getAs[Int]("height") == 224))
  }

  test("resizeImages: nearest-neighbor pixels match the hand-computed map") {
    import spark.implicits._
    // 2×2 source [[10,20],[30,40]] → 4×4: each source pixel becomes a
    // 2×2 block (src index = floor(dst·2/4)); 4×4 → 2×2 picks the
    // top-left of each block, recovering the original.
    val src = Array[Byte](10, 20, 30, 40)
    val media = Seq(MediaRow(1L, "image",
      MediaCodec.pngEncodeGray(2, 2, src), MediaMeta(2, 2, 0, 0))).toDF()
    val up = MediaOps.resizeImages(media, 4, 4).collect().head
    val (uw, uh, upx) = MediaCodec.pngDecodeGray(up.getAs[Array[Byte]]("png"))
    assert((uw, uh) == (4, 4))
    assert(upx.toSeq == Seq[Byte](
      10, 10, 20, 20,
      10, 10, 20, 20,
      30, 30, 40, 40,
      30, 30, 40, 40))
    val down = MediaOps.resizeImages(
      Seq(MediaRow(2L, "image", MediaCodec.pngEncodeGray(4, 4,
        upx), MediaMeta(4, 4, 0, 0))).toDF(), 2, 2).collect().head
    assert(MediaCodec.pngDecodeGray(down.getAs[Array[Byte]]("png"))._3.toSeq == src.toSeq)
  }

  test("resizeImages: re-encoded PNGs are valid to javax.imageio; non-images drop") {
    val media = MediaOps.syntheticMedia(spark, 30)
    val nImages = media.filter(col("kind") === "image").count()
    val out = MediaOps.resizeImages(media, 7, 5).collect()
    assert(out.length == nImages, "exactly the image rows must survive")
    out.foreach { r =>
      val png = r.getAs[Array[Byte]]("png")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == 7 && img.getHeight == 5)
      // independent decoder sees the same pixels our decoder produces
      val (_, _, px) = MediaCodec.pngDecodeGray(png)
      for (y <- 0 until 5; x <- 0 until 7)
        assert((img.getRaster.getSample(x, y, 0) & 0xff) == (px(y * 7 + x) & 0xff))
    }
  }
}
