package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query (or a name-regex
  * subset) to one text file per query — the optimization round's plan
  * evidence (`plans/r15/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [suffix] [nameRegex]
  *   suffix defaults to "before" → files are `<name>_<suffix>.txt`.
  *
  * The dump renders the ANALYZED→physical plan without executing the query
  * (`queryExecution.explainString`), so AQE nodes show the initial plan —
  * the same thing `df.explain("formatted")` prints.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "before"
    val nameFilter = if (args.length > 3) Some(args(3).r) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Sessions.deriveShuffle(spark, sfDir, cpus.toInt)
    new java.io.File(outDir).mkdirs()
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
    qs.foreach { case (name, fn) =>
      val path = s"$outDir/${name}_$suffix.txt"
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(path)
        try w.println(txt) finally w.close()
        // a plan-shape one-liner to stdout for quick grep: exchanges + joins
        val nExch = "Exchange".r.findAllIn(txt).length
        val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)".r
          .findAllIn(txt).toSeq.groupBy(identity).map { case (k, v) => s"$k=${v.size}" }.mkString(",")
        println(s"[plandump] $name exchanges=$nExch joins=[$joins]")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
