package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Real-time per-stage WALL attribution for one query — SpillProbe's
  * sibling for the case where the pathology is time, not memory (r15:
  * q145's sf10 wall was 100× its candidate-bound estimate; the spill
  * probe showed nothing because nothing spilled). Prints every stage as
  * it completes: duration, task count, records read/written, callSite.
  *
  * usage: StageProbe <sfDir> <queryName>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProbe <sfDir> <queryName>")
    val (sfDir, name) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.deriveShuffle(spark, sfDir, cpus.toInt)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val dur = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b)
          .getOrElse(-1L)
        val site = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("StageProbe"))
          .orElse(si.details.linesIterator.find(_.nonEmpty)).getOrElse("").trim
        // stderr so it interleaves with Spark's own progress output
        System.err.println(
          f"[stage] id=${si.stageId}%5d wall=${dur / 1000.0}%8.1fs tasks=${si.numTasks}%4d " +
            f"in=${m.inputMetrics.recordsRead}%12d sRead=${m.shuffleReadMetrics.recordsRead}%12d " +
            f"sWrite=${m.shuffleWriteMetrics.recordsWritten}%12d $site")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // SPARK_GRAFT_PROBE_WARMUPS untimed warm-up executions first (JIT,
    // codegen cache, store builds) so the attributed run matches the
    // bench's warm-median regime; stages of the warm-ups still print but
    // the [total] line times only the final run.
    val warmups = sys.env.getOrElse("SPARK_GRAFT_PROBE_WARMUPS", "0").toInt
    (1 to warmups).foreach { w =>
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      graft.ml.BlockTopK.releaseBroadcasts(spark)
      System.gc()
      System.err.println(s"[warmup] $w done")
    }
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    println(f"[total] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
