package graft.pipelines

import graft.SparkSpec
import graft.sources.WeightTxt
import org.apache.spark.sql.functions._

class WeightPipelineSpec extends SparkSpec {

  private val sample =
    """ignored first line
      |Time:08:22, Fri,12/ 19/2025
      |Weight:90.4kg  ↑   Overweight
      |BMI:27.3  ↑   Overweight
      |Body fat:31.2%  ↓
      |BMR:1823kcal
      |""".stripMargin

  test("TXT parser: EAV contract, units stripped, spaced date kept (FIXTURES A3)") {
    val rows = WeightTxt.parseContent(sample, "f1.txt")
    assert(rows.length == 4)
    val w = rows.find(_.attribute == "Weight").get
    assert(w.value == "90.4" && w.info_symbol == "↑" && w.info_txt == "Overweight")
    assert(w.day_name == "Fri" && w.date == "12/ 19/2025" && w.time == "08:22")
    val bmr = rows.find(_.attribute == "BMR").get
    assert(bmr.value == "1823" && bmr.info_symbol == "" && bmr.info_txt == "")
    assert(rows.forall(_.source_file_id == "f1.txt"))
  }

  test("TXT parser edge cases: short file, missing header, line without colon") {
    assert(WeightTxt.parseContent("a\nb", "x").isEmpty)
    assert(WeightTxt.parseContent("a\nNotTime\nWeight:90kg", "x").isEmpty)
    val rows = WeightTxt.parseContent("a\nTime:08:22, Fri,12/19/2025\nno colon line\nBMI:27.3", "x")
    assert(rows.map(_.attribute) == Seq("BMI"))
  }

  test("pivot: wide matrix, BMR dropped, doubles typed, spaced date parsed") {
    import spark.implicits._
    val eav = WeightTxt.parseContent(sample, "f1").toDF()
    val wide = WeightPipeline.pivoted(eav)
    assert(!wide.columns.contains("BMR"))
    val row = wide.collect()(0)
    assert(row.getAs[java.sql.Timestamp]("date_time").toString.startsWith("2025-12-19 08:22"))
    assert(row.getAs[Double]("Weight") == 90.4)
    assert(row.getAs[Double]("BMI") == 27.3)
  }

  test("weekly resample: right-closed end-labeled bins and weight_change sign (SURVEY §7.4 items 4-5)") {
    import spark.implicits._
    // two ISO-dated files in consecutive weeks
    def file(date: String, w: String) =
      s"x\nTime:08:00, Mon,$date\nWeight:${w}kg\nBMI:25.0"
    val eav = (WeightTxt.parseContent(file("2025-12-01", "90.0"), "a") ++
      WeightTxt.parseContent(file("2025-12-02", "92.0"), "b") ++
      WeightTxt.parseContent(file("2025-12-08", "89.0"), "c")).toDF()
    val weekly = WeightPipeline.weeklyResample(WeightPipeline.pivoted(eav), targetDow = 1)
    val rows = weekly.collect()
    // Dec 1-2 2025 (Mon,Tue) → Sunday Dec 7 bin; Dec 8 → Dec 14 bin; desc order
    assert(rows.map(_.getAs[java.sql.Date]("period_end").toString).toSeq ==
      Seq("2025-12-14", "2025-12-07"))
    assert(rows(1).getAs[Double]("average_weight") == 91.0)
    // current − previous period: 89.0 − 91.0 = −2.0 on the latest row
    assert(rows(0).getAs[Double]("weight_change") == -2.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("weight_change")))
  }

  test("monthly resample labels by month end") {
    import spark.implicits._
    def file(date: String, w: String) = s"x\nTime:08:00, Mon,$date\nWeight:${w}kg"
    val eav = (WeightTxt.parseContent(file("2025-11-03", "90.0"), "a") ++
      WeightTxt.parseContent(file("2025-12-01", "88.0"), "b")).toDF()
    val monthly = WeightPipeline.monthlyResample(WeightPipeline.pivoted(eav))
    val rows = monthly.collect()
    assert(rows.map(_.getAs[java.sql.Date]("period_end").toString).toSeq ==
      Seq("2025-12-31", "2025-11-30"))
  }

  test("trendline: 28-day rolling mean over the series") {
    import spark.implicits._
    def file(date: String, w: String) = s"x\nTime:08:00, Mon,$date\nWeight:${w}kg"
    val eav = (WeightTxt.parseContent(file("2025-12-01", "90.0"), "a") ++
      WeightTxt.parseContent(file("2025-12-10", "92.0"), "b") ++
      WeightTxt.parseContent(file("2025-12-20", "94.0"), "c")).toDF()
    val t = WeightPipeline.trendline(WeightPipeline.pivoted(eav))
      .orderBy("date_time").collect()
    assert(t(0).getAs[Double]("trend") == 90.0)
    assert(t(1).getAs[Double]("trend") == 91.0)
    assert(t(2).getAs[Double]("trend") == 92.0)
  }

  test("BMI table generates kg conversions without a driver loop") {
    val t = WeightPipeline.bmiTable(spark, 182, 25.0, 25.2).collect()
    assert(t.length == 3)
    assert(t.head.getAs[Double]("kg") == math.rint(25.0 * 1.82 * 1.82 * 10) / 10)
  }
}
