package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The q56 regime question, finally measurable (r11): bloom semi-join
  * pruning exists to cut PROBE-SIDE EXCHANGE — rows that can never match
  * are dropped before the shuffle — but on local[32] a shuffle is a
  * same-heap memory copy, so the prune measured ≈ the plain join at
  * every SF (BASELINE.md r10 watch item). With the standalone cluster,
  * shuffle rows pay real serialization + loopback transport, which is
  * the first regime where the prune CAN show its cut. This probe runs
  * the identical join+agg with and without the prune, interleaved
  * A/B/A/B (machine-state fairness), and reports medians + the pruned
  * row fraction.
  *
  * Usage: `BloomClusterProbe <masterUrl> <sfDir> [reps]` — same env as
  * ClusterParity for executor sizing/jar. */
object BloomClusterProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BloomClusterProbe <masterUrl> <sfDir> [reps]")
    val Array(master, sfDir) = args.take(2)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    var b = graft.core.Sessions.builder(master, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    sys.env.get("SPARK_GRAFT_EXEC_MEM").foreach(m => b = b.config("spark.executor.memory", m))
    sys.env.get("SPARK_GRAFT_EXEC_CORES").foreach(c => b = b.config("spark.executor.cores", c))
    sys.env.get("SPARK_GRAFT_JAR").foreach(j => b = b.config("spark.jars", j))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    def urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    def items = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag", "l_quantity")
    def tail(probe: DataFrame): DataFrame =
      probe.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          count_distinct(col("o_orderkey")).as("n_orders"),
          sum(graft.functions.ExactDecimal.cents(col("l_quantity"))).as("qty_cents"))

    // force the plain join's shuffle (no broadcast) so both variants pay
    // the same join strategy and the ONLY difference is pre-shuffle rows
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val total = items.count()
    val bloomBytes = graft.expr.BloomFns.buildKeyFilter(urgent, "o_orderkey")
    val kept = items.filter(
      graft.expr.BloomFns.mightContain(spark, bloomBytes, col("l_orderkey"))).count()

    def run(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(tail(items)) // warm-up
    run(tail(graft.expr.BloomFns.semiPrune(items, "l_orderkey", urgent, "o_orderkey")))
    val (plain, pruned) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (0 until reps).foreach { _ =>
      plain += run(tail(items))
      pruned += run(tail(graft.expr.BloomFns.semiPrune(items, "l_orderkey", urgent, "o_orderkey")))
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    println(f"""{"master":"$master","sf":"$sfDir","reps":$reps,"rows_total":$total,"rows_after_prune":$kept,"prune_frac":${1.0 - kept.toDouble / total}%.3f,"plain_med_s":${med(plain.result())}%.3f,"pruned_med_s":${med(pruned.result())}%.3f}""")
    spark.stop()
  }
}
