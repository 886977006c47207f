package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaOpsSpec extends SparkSpec {

  test("synthetic media: deterministic bytes, typed metadata struct") {
    val m1 = MediaOps.syntheticMedia(spark, 20).collect()
    val m2 = MediaOps.syntheticMedia(spark, 20).collect()
    assert(m1.map(_.getAs[Array[Byte]]("bytes").toSeq).toSeq ==
      m2.map(_.getAs[Array[Byte]]("bytes").toSeq).toSeq)
    assert(m1.forall(_.getAs[Array[Byte]]("bytes").length == 96))
    val meta = m1.head.getStruct(m1.head.fieldIndex("meta"))
    assert(meta.getAs[Int]("sample_rate") == 16000)
    assert(Set("image", "audio", "video")(m1.head.getAs[String]("kind")))
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
      assert(math.abs(v.sum - 1.0f) < 1e-4, "histogram must be normalized")
    }
    // deterministic across runs
    val again = MediaOps.imageFeatures(media).orderBy("media_id").collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("features")).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("features")).toSeq)
  }

  test("decode stub: pure function of bytes, empty-safe") {
    val a = MediaOps.decodeToFeatures(Array[Byte](0, 1, 2, 3))
    val b = MediaOps.decodeToFeatures(Array[Byte](0, 1, 2, 3))
    assert(a.toSeq == b.toSeq)
    assert(MediaOps.decodeToFeatures(Array.empty).toSeq == Seq.fill(16)(0f))
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

  test("resizeMeta: metadata transform preserves other fields") {
    val m = MediaOps.resizeMeta(MediaOps.syntheticMedia(spark, 5), 224, 224)
    val meta = m.select("meta.*").collect()
    assert(meta.forall(r => r.getAs[Int]("width") == 224 && r.getAs[Int]("height") == 224))
    assert(meta.forall(_.getAs[Int]("sample_rate") == 16000))
  }
}
