package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured decomposition of q55's sf10 superlinearity (the one
  * storage-tier row that grew 7.8× for 10× data — BASELINE.md): is the
  * cost (a) the bucket count pinned at 16 (16 tasks on a 32-core
  * machine, per-task input growing with the corpus), or (b) the
  * count_distinct tail (whose partial dedupe shuffles a (priority,
  * orderkey) pair stream — NOT the 5-rows-per-partition shuffle of the
  * plain agg)?
  *
  * Usage: BucketProbe <sfDir> — writes lineitem/orders bucketed at 16
  * and at a parallelism-matched count, times (join + plain agg) and
  * (join + count_distinct agg) over each layout (forced through the
  * noop-sink convention, median of 3), prints one JSON line.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables
    import graft.operators.BucketedTables

    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def sink(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def median3(body: => Unit): Double = {
      body // warm-up, untimed
      Seq.fill(3)(timed(body)).sorted.apply(1)
    }

    def layout(buckets: Int): (String, String) = {
      val lt = s"probe_li_${buckets}_$tag"
      val ot = s"probe_ord_${buckets}_$tag"
      BucketedTables.ensureBucketed(li, lt, "l_orderkey", buckets)
      BucketedTables.ensureBucketed(ord, ot, "o_orderkey", buckets)
      (lt, ot)
    }
    def joined(lt: String, ot: String): DataFrame =
      BucketedTables.bucketedJoin(spark, lt, ot, "l_orderkey", "o_orderkey")
    def plainAgg(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(graft.functions.ExactDecimal.cents(col("l_quantity"))).as("qty_cents"))
    def distinctAgg(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(count_distinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"),
          sum(graft.functions.ExactDecimal.cents(col("l_quantity"))).as("qty_cents"))

    val (lt16, ot16) = layout(16)
    val bucketsWide = cpus.toInt.max(16)
    val (ltW, otW) = layout(bucketsWide)

    val tPlain16 = median3(sink(plainAgg(joined(lt16, ot16))))
    val tDist16 = median3(sink(distinctAgg(joined(lt16, ot16))))
    val tPlainW = median3(sink(plainAgg(joined(ltW, otW))))
    val tDistW = median3(sink(distinctAgg(joined(ltW, otW))))

    println(s"""{"sf":"$sfDir","bucketsWide":$bucketsWide,""" +
      f""""plain16":$tPlain16%.3f,"distinct16":$tDist16%.3f,""" +
      f""""plainWide":$tPlainW%.3f,"distinctWide":$tDistW%.3f}""")
    spark.stop()
  }
}
