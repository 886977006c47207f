package graft.tools

import org.apache.spark.sql.functions._

/** Media-tier scale probe (r15 verdict #3: q90/p5 had never run past
  * the 2k-object fixture lake). Generates the SAME deterministic
  * synthetic media lake ([[graft.multimodal.MediaOps.syntheticMedia]] —
  * real PNG/WAV payloads, retake pairs and all) at an arbitrary object
  * count, then times the two production stages exactly as the gated
  * queries run them:
  *
  *  - FEATURES (p5's stage): decode → fixed-dim features via the
  *    mapPartitions codec kernels, media_id-range layout write;
  *  - NEARDUP (q90's tail): RHP bucket → (bucket, kind) equi-join →
  *    per-kind L1 threshold pairs → star closure.
  *
  * `MediaScaleProbe <n> [outDir]` prints one JSON line with both walls,
  * row/pair/component counts, and the staged bytes. Scale equivalences
  * for the suite: 2000 ≡ the sf0.1 gate lake, 20k ≡ sf1, 200k ≡ sf10
  * (the documents-table ratio ScaleUp uses). Run under a small driver
  * heap (SPARK_DRIVER_MEM) to surface codec-batch memory spikes —
  * the decode kernels hold one media object per iterator element, so
  * per-task memory is bounded by the largest single payload, not the
  * partition (MediaOpsSpec pins that contract at gate scale). */
object MediaScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val out = args.lift(1).getOrElse(s"/tmp/graft_media_scale_$n")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (_, featSec) = timed {
      graft.multimodal.MediaOps.imageFeatures(
          graft.multimodal.MediaOps.syntheticMedia(spark, n))
        .repartitionByRange(
          spark.sessionState.conf.numShufflePartitions, col("media_id"))
        .write.mode("overwrite").parquet(out)
    }
    val stagedBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(out)).getLength
    val feats = spark.read.parquet(out)

    val (comp, dedupSec) = timed {
      val c = graft.multimodal.MediaOps
        .nearDupComponents(feats, nPlanes = 8, l1Threshold = 0.004)
        .persist()
      c.count()
      c
    }
    val rows = comp.count()
    val dups = comp.filter(col("is_duplicate")).count()
    println(f"""{"tool":"media_scale","n":$n,"feat_sec":$featSec%.1f,"neardup_sec":$dedupSec%.1f,"rows":$rows,"dups":$dups,"staged_bytes":$stagedBytes}""")
    spark.stop()
  }
}
