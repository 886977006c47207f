package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-STAGE spill attribution for one query — the measurement layer the
  * run-level `ClusterParity` spilledBytes cannot give: WHICH stage of a
  * multi-stage store-build + search actually spills (r14 ask: "measure
  * which stage actually spills, then try the cheapest lever").
  *
  * Output: one line per stage with spill > 0 (plus the run total):
  * stageId, memory/disk spilled, shuffle read/write, and the first line
  * of the stage's callSite (the DataFrame op that planned it). Run it
  * under the same heap/width as the gate being diagnosed.
  *
  * usage: SpillProbe <sfDir> <queryName>
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SpillProbe <sfDir> <queryName>")
    val (sfDir, name) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.deriveShuffle(spark, sfDir, cpus.toInt)
    val stages = new ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null && (m.memoryBytesSpilled > 0 || m.diskBytesSpilled > 0)) {
          // the first graft.* frame names the operator that planned the
          // stage — the raw callSite head is often an executor-pool
          // anonfun (broadcast-thread jobs especially)
          val site = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("SpillProbe"))
            .orElse(si.details.linesIterator.find(_.nonEmpty))
            .getOrElse("").trim
          stages.put(si.stageId,
            f"stage=${si.stageId}%5d memSpill=${m.memoryBytesSpilled / 1e9}%9.2fGB " +
              f"diskSpill=${m.diskBytesSpilled / 1e9}%8.2fGB " +
              f"shufWrite=${m.shuffleWriteMetrics.bytesWritten / 1e9}%8.2fGB " +
              f"shufRead=${m.shuffleReadMetrics.totalBytesRead / 1e9}%8.2fGB " +
              f"tasks=${si.numTasks}%5d  name=${si.name.take(60)} site=$site")
          ()
        }
      }
    })
    val t0 = System.nanoTime()
    val (h, n) = ClusterParity.fingerprint(graft.SparkEntry.queries(name)(spark, sfDir))
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // listener-bus drain (best effort)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (_, line) => println(line) }
    println(f"[spillprobe] $name rows=$n hash=$h sec=$dt%.1f " +
      s"spillingStages=${stages.size()}")
    spark.stop()
  }
}
