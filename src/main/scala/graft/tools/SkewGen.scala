package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zipf-skewed twin generator — the skew counterpart of [[ScaleUp]]: the
  * driver testdata's keys are near-uniform, so the salted paths
  * (q52/q60, `SkewFns`) are proven correct there but their scale CLAIM
  * — bounded per-task input under a hot key — needs data where one key
  * actually holds a disproportionate share. This rewrites a table's key
  * column to a hot-key + Zipf(1) tail distribution, deterministically
  * (key choice is a pure function of the row id — no RNG, replays are
  * byte-stable):
  *
  *  - with probability `hotShare` (default 20%) a row maps to key 0 —
  *    the single hot key a naive shuffle would funnel into ONE task;
  *  - otherwise to ⌊K^u⌋ (u uniform from a second hash) — the inverse
  *    CDF of Zipf with s = 1 over [1, K], the standard web-corpus key
  *    distribution (hosts, near-dup cluster sizes, vocab ranks).
  *
  * Used by SkewGateSpec to measure, not assume, the per-task bound of
  * the salted plans against this distribution; the CLI writes a skewed
  * twin dir for ad-hoc bench runs.
  */
object SkewGen {

  /** u ∈ [0, 1) as a pure function of (row id, stream) — two decorrelated
    * streams per id via distinct hash seeds. */
  private def unit(id: Column, stream: Int): Column =
    (pmod(hash(id, lit(stream)), lit(1000000)).cast("double") + 0.5) / 1000000.0

  /** Rewrite `keyCol` (long) to the hot+Zipf distribution: key 0 holds
    * `hotShare` of the mass; the tail draws `floor(K^u)` for u ∈ [0, 1),
    * i.e. keys 1 .. K−1 — key K itself never occurs (K^u < K for every
    * u < 1), so size consumers to K−1 tail keys plus the hot key. */
  def skewKey(df: DataFrame, idCol: String, keyCol: String,
              hotShare: Double = 0.2, tailKeys: Int = 1000): DataFrame = {
    require(hotShare > 0 && hotShare < 1, "hotShare in (0,1)")
    val id = col(s"`$idCol`")
    val zipf = floor(pow(lit(tailKeys.toDouble), unit(id, 2))).cast("long")
    df.withColumn(keyCol,
      when(unit(id, 1) < hotShare, lit(0L)).otherwise(zipf))
  }

  /** events twin: user_id becomes the skewed key (event_id is the row
    * identity — untouched, so joins/windows keep their arity). */
  def skewedEvents(events: DataFrame, hotShare: Double = 0.2,
                   tailKeys: Int = 1000): DataFrame =
    skewKey(events, "event_id", "user_id", hotShare, tailKeys)

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val hotShare = args.lift(2).map(_.toDouble).getOrElse(0.2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = skewedEvents(spark.read.parquet(s"$src/events.parquet"), hotShare)
    out.write.mode("overwrite").parquet(s"$dst/events.parquet")
    println(s"[skewgen] events -> ${spark.read.parquet(s"$dst/events.parquet").count()} rows, hotShare=$hotShare")
    spark.stop()
  }
}
