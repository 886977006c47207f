package graft.tools

/** Derived-width wall for the LSH margin-mining shape (q147's operator
  * at the width `lshBitsFor` actually picks for the corpus) — the
  * production number the pinned-8-bit gate query deliberately isn't at
  * sf10+ (same pinned-vs-derived split as q32 → q117).
  *
  * usage: MarginScaleProbe <sfDir> [nbits]   (nbits ≤ 0 → derived)
  */
object MarginScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MarginScaleProbe <sfDir> [nbits]")
    val sfDir = args(0)
    val nbits = args.lift(1).map(_.toInt).getOrElse(-1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.deriveShuffle(spark, sfDir, cpus.toInt)
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val bits = if (nbits > 0) nbits else graft.functions.VecFns.lshBitsFor(e.count())
    val t0 = System.nanoTime()
    val out = graft.queries.MiningQueries.marginMiningLsh(e, nbits = bits)
    out.write.mode("overwrite").format("noop").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[margin-scale] sf=$sfDir bits=$bits wall=$dt%.1fs")
    spark.stop()
  }
}
