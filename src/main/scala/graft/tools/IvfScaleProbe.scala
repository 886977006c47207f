package graft.tools

import org.apache.spark.sql.functions._

/** Measured comparison of IVF search cost at a pinned k vs the
  * corpus-derived `kFor` k — the experiment behind the q94 sf10 scale
  * diagnosis (BASELINE.md): search candidates are `nprobe · N²/k` rows,
  * so a k pinned at 32 (the oracle's choice, right for the gate's 2k
  * vectors) turns quadratic at scale, while k = √N holds the candidate
  * count to `nprobe · N^1.5`.
  *
  * Usage: IvfScaleProbe <sfDir> [nprobe] — builds one store per k under
  * process-unique roots (build timed separately from search; the search
  * result is forced through the noop sink, the bench convention), prints
  * one JSON line: {"n":…,"kPinned":32,"kDerived":…,"searchPinnedSec":…,
  * "searchDerivedSec":…,"buildPinnedSec":…,"buildDerivedSec":…}.
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nprobe = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = vecs.count()
    val kDerived = graft.operators.IncrementalIvf.kFor(n)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def probe(k: Int, tag: String): (Double, Double) = {
      val root = graft.core.StorePaths.root(s"ivfprobe_$tag", sfDir)
      val (_, tBuild) = timed {
        graft.operators.IncrementalIvf.writeIndex(vecs, root, k, iters = 2)
      }
      // one untimed warm-up search (codegen/JIT), then the timed one
      graft.operators.IncrementalIvf.search(spark, root, vecs, nprobe, topK = 3)
        .write.mode("overwrite").format("noop").save()
      val (_, tSearch) = timed {
        graft.operators.IncrementalIvf.search(spark, root, vecs, nprobe, topK = 3)
          .write.mode("overwrite").format("noop").save()
      }
      (tBuild, tSearch)
    }
    val (bPin, sPin) = probe(32, "pinned")
    val (bDer, sDer) = probe(kDerived, "derived")
    println(f"""{"n":$n,"kPinned":32,"kDerived":$kDerived,"nprobe":$nprobe,""" +
      f""""buildPinnedSec":$bPin%.3f,"searchPinnedSec":$sPin%.3f,""" +
      f""""buildDerivedSec":$bDer%.3f,"searchDerivedSec":$sDer%.3f}""")
    spark.stop()
  }
}
