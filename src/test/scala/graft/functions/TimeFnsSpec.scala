package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

class TimeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("lastSundayOfMonth matches known BST boundary dates") {
    // Known UK clock-change Sundays (public calendar facts).
    val rows = Seq((2022, 3), (2022, 10), (2024, 3), (2025, 10), (2026, 3))
      .toDF("y", "m")
      .select(TimeFns.lastSundayOfMonth(col("y"), col("m")).as("d"))
      .as[Date].collect().map(_.toString)
    assert(rows === Seq("2022-03-27", "2022-10-30", "2024-03-31", "2025-10-26", "2026-03-29"))
  }

  test("bst window: naive local rule, not tz conversion") {
    // Ref: utils/duckdb_electricity_1-minute.py:43-55 — inside
    // [last Sun Mar 01:00, last Sun Oct 02:00) shift back 1h.
    val df = Seq(
      "2023-03-26 00:59:00", // 1 min before BST start → unchanged
      "2023-03-26 01:00:00", // exactly at start → shifted
      "2023-10-29 01:59:59", // just inside → shifted
      "2023-10-29 02:00:00"  // at end → unchanged
    ).toDF("s")
      .withColumn("ts", to_timestamp(col("s")))
      .withColumn("yr", year(col("ts")))
      .withColumn("utc", TimeFns.localToUtc(col("ts"), TimeFns.bstStart(col("yr")), TimeFns.bstEnd(col("yr"))))
      .select(col("utc").cast("string")).as[String].collect()
    assert(df === Seq(
      "2023-03-26 00:59:00", "2023-03-26 00:00:00",
      "2023-10-29 00:59:59", "2023-10-29 02:00:00"))
  }

  test("timeBucket15EndLabeled: 07:00 lands in 06:45 bucket (SURVEY §7.4 item 3)") {
    val out = Seq("2024-01-01 07:00:00", "2024-01-01 07:00:59", "2024-01-01 07:01:00",
      "2024-01-01 07:15:00", "2024-01-01 00:00:30")
      .toDF("s")
      .select(TimeFns.timeBucket15EndLabeled(to_timestamp(col("s"))).cast("string"))
      .as[String].collect()
    assert(out === Seq(
      "2024-01-01 06:45:00", "2024-01-01 06:45:00", "2024-01-01 07:00:00",
      "2024-01-01 07:00:00", "2023-12-31 23:45:00"))
  }

  test("peakCategory boundaries: 06:30 exclusive, 23:30 inclusive") {
    val out = Seq("2024-01-01 06:30:00", "2024-01-01 06:31:00",
      "2024-01-01 23:30:00", "2024-01-01 23:31:00")
      .toDF("s").select(TimeFns.peakCategory(to_timestamp(col("s"))))
      .as[String].collect()
    assert(out === Seq("OP", "P", "P", "OP"))
  }

  test("weekEndSunday: right-closed pandas W-SUN labels") {
    val out = Seq("2024-01-01", "2024-01-07", "2024-01-08")
      .toDF("s").select(TimeFns.weekEndSunday(to_date(col("s"))).cast("string"))
      .as[String].collect()
    // Mon→next Sun, Sun→itself, Mon→next Sun
    assert(out === Seq("2024-01-07", "2024-01-07", "2024-01-14"))
  }

  test("tryToTimestampMulti parses all reference formats, coerces errors to null") {
    val out = Seq("2024-03-01 10:00:00", "01/03/2024 10:00:00", "03/01/2024 10:00", "garbage")
      .toDF("s")
      .select(TimeFns.tryToTimestampMulti(col("s"), TimeFns.ReferenceFormats).cast("string"))
      .as[String].collect()
    assert(out(0) === "2024-03-01 10:00:00")
    assert(out(1) === "2024-03-01 10:00:00")
    assert(out(2) === "2024-03-01 10:00:00")
    assert(out(3) === null)
  }
}
