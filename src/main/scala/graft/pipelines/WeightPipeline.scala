package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** The weight-tracker analytics pipeline (SURVEY P1; ref:
  * utils/20251223-weight-for-streamlit.py:200-360), Spark-first:
  * EAV long table → typed wide matrix → trendline / resamples.
  *
  * Every stage is a lazy DataFrame transform; the Streamlit rerun loop of
  * the reference becomes re-invocation with different literals (Catalyst
  * re-plans; callers cache the source DF for interactivity).
  *
  * Scale: the pivot groups by timestamp (hash shuffle on date_time); the
  * rolling trend is a per-day-partitioned range window in the query layer
  * (q37) — here kept global-ordered only because the weight series of one
  * person is tiny by construction; `attributes` is pinned for a
  * deterministic pivot schema (SURVEY §7.4 item 7).
  */
object WeightPipeline {

  /** The reference's attribute set (ref: 20251223-weight-for-streamlit.py:279). */
  val Attributes: Seq[String] = Seq(
    "Weight", "BMI", "Bone Mass", "Muscle Mass", "Body fat",
    "Visceral fat", "Body water", "BMR")

  /** date+time → typed timestamp; the date may carry an inner space
    * ("12/ 19/2025" — SURVEY §7.4 item 10). Unparseable → null → dropped. */
  def withDateTime(eav: DataFrame): DataFrame =
    eav.withColumn("date_time",
        TimeFns.tryToTimestampMulti(
          concat_ws(" ", regexp_replace(col("date"), "/\\s+", "/"), col("time")),
          Seq("MM/dd/yyyy HH:mm", "yyyy-MM-dd HH:mm", "dd/MM/yyyy HH:mm")))
      .filter(col("date_time").isNotNull)

  /** EAV long → wide per-timestamp matrix with numeric casts, BMR dropped
    * (ref :256-264). `first(value)` with an explicit tiebreak via max —
    * duplicate (ts, attribute) readings keep the lexicographically
    * greatest raw string, deterministic under shuffle. */
  def pivoted(eav: DataFrame): DataFrame = {
    val wide = withDateTime(eav)
      .groupBy("date_time")
      .pivot("attribute", Attributes)
      .agg(max("value"))
    Attributes.filterNot(_ == "BMR").foldLeft(wide.drop("BMR")) { (df, a) =>
      df.withColumn(a, col(a).cast("double"))
    }
  }

  /** Most recent N readings from a start date (ref :272-277). */
  def recent(wide: DataFrame, n: Int, startDate: String): DataFrame =
    wide.filter(col("date_time") >= lit(startDate))
      .orderBy(col("date_time").desc)
      .limit(n)

  /** 28-day rolling mean trendline over the weight series (ref :300-310). */
  def trendline(wide: DataFrame, windowDays: Int = 28): DataFrame = {
    val w = Window.orderBy(unix_micros(col("date_time")))
      .rangeBetween(-windowDays.toLong * 86400L * 1000000L, 0L)
    wide.withColumn("trend", round(avg("Weight").over(w), 4))
      .select("date_time", "Weight", "trend")
  }

  private val DowRule = Map(1 -> "W-SUN", 2 -> "W-MON", 3 -> "W-TUE",
    4 -> "W-WED", 5 -> "W-THU", 6 -> "W-FRI", 7 -> "W-SAT")

  private def meanResample(wide: DataFrame, rule: String): DataFrame =
    graft.operators.TemporalOps.resample(wide, "date_time", rule, Seq(
      round(avg("Weight"), 1).as("average_weight"),
      round(avg("BMI"), 1).as("average_bmi")))

  /** pandas resample('W-{dow}').mean().round(1) with right-closed,
    * end-labeled weekly bins (ref :327-345; SURVEY §7.4 item 4), plus the
    * desc-ordered `weight_change = current − previous period` (item 5).
    * Routed through the generic [[graft.operators.TemporalOps.resample]]
    * operator — the p1/q21 oracles prove that operator's bin labels. */
  def weeklyResample(wide: DataFrame, targetDow: Int = 1): DataFrame =
    withChange(meanResample(wide, DowRule(targetDow)))

  /** pandas resample('ME') monthly variant (ref :344). */
  def monthlyResample(wide: DataFrame): DataFrame =
    withChange(meanResample(wide, "ME"))

  /** current − previous period on the desc-sorted frame (ref :347-348):
    * `Weight - Weight.shift(-1)` where the row below is the previous
    * period. Window is over the tiny aggregated output, not raw rows. */
  private def withChange(resampled: DataFrame): DataFrame = {
    val w = Window.orderBy(col("period_end").desc)
    resampled
      .withColumn("weight_change",
        round(col("average_weight") - lead("average_weight", 1).over(w), 1))
      .orderBy(col("period_end").desc)
  }

  /** BMI↔kg conversion table for a height (ref :191-198) — a generated
    * `sequence` transform, no driver loop. */
  def bmiTable(spark: org.apache.spark.sql.SparkSession,
               heightCm: Double, bmiFrom: Double, bmiTo: Double): DataFrame = {
    val hm2 = (heightCm / 100.0) * (heightCm / 100.0)
    spark.range(1)
      .select(explode(sequence(lit((bmiFrom * 10).toInt), lit((bmiTo * 10).toInt))).as("bmi10"))
      .select(
        (col("bmi10") / 10.0).as("bmi"),
        round(col("bmi10") / 10.0 * hm2, 1).as("kg"))
  }
}
