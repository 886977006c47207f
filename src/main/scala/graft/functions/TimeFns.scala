package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-function library for the reference's temporal semantics
  * (SURVEY §2.8 date/time, §7.4 hard parts). All pure `Column`
  * compositions — codegen'd by Catalyst, no UDFs.
  */
object TimeFns {

  /** Last Sunday of (year, month) as a date.
    * Ref: utils/duckdb_electricity_1-minute.py:29-35 — last day of month,
    * stepped back to the preceding Sunday. Spark `dayofweek`: Sunday=1.
    */
  def lastSundayOfMonth(year: Column, month: Column): Column = {
    val lastDay = last_day(make_date(year, month, lit(1)))
    date_sub(lastDay, (dayofweek(lastDay) - lit(1)) % lit(7))
  }

  /** BST window start for a year: last Sunday of March 01:00 (naive local).
    * Ref: utils/duckdb_electricity_1-minute.py:25-37. */
  def bstStart(year: Column): Column =
    to_timestamp(concat_ws(" ", lastSundayOfMonth(year, lit(3)), lit("01:00:00")))

  /** BST window end for a year: last Sunday of October 02:00 (naive local). */
  def bstEnd(year: Column): Column =
    to_timestamp(concat_ws(" ", lastSundayOfMonth(year, lit(10)), lit("02:00:00")))

  /** Naive-local → UTC under the reference's hand-rolled BST rule:
    * inside [bstStart, bstEnd) subtract one hour, else unchanged.
    * Deliberately NOT a tz conversion (SURVEY §7.4 item 6). */
  def localToUtc(ts: Column, start: Column, end: Column): Column =
    when(ts >= start && ts < end, ts - expr("INTERVAL 1 HOUR")).otherwise(ts)

  /** Minute-of-day (0..1439) for time-of-day comparisons — Spark has no
    * TimeType (SURVEY §1.2). */
  def minuteOfDay(ts: Column): Column = hour(ts) * lit(60) + minute(ts)

  /** Microsecond-of-day — the reference compares full TIME values
    * (`CAST(MinuteGrid AS TIME)`), which carry fractional seconds: a grid
    * minute stamped 06:30:00.000123 is peak there, off-peak under any
    * whole-second/minute compare. Matters because grid timestamps inherit
    * the sub-second part of their reading. */
  def microOfDay(ts: Column): Column =
    pmod(unix_micros(ts), lit(86400000000L))

  /** Peak classification: TIME '06:30:00' < t <= TIME '23:30:00' → "P"
    * else "OP" — at full TIME (microsecond) precision, like the
    * reference. Ref: utils/duckdb_electricity_1-minute.py:100-106. */
  def peakCategory(ts: Column): Column =
    when(microOfDay(ts) > lit(23400000000L) && microOfDay(ts) <= lit(84600000000L),
      lit("P")).otherwise(lit("OP"))

  /** End-labeled 15-minute bucket: floor(ts - 1 minute) to the 15-minute
    * grid, so a minute stamped 07:00 lands in the 06:45 bucket.
    * Ref: utils/duckdb_electricity_1-minute.py:149-153.
    * Epoch-floor form (900 s divides days, so this equals the reference's
    * hour-trunc + minute arithmetic and DuckDB's `time_bucket`). */
  def timeBucket15EndLabeled(ts: Column): Column =
    timestamp_seconds(floor(unix_micros(ts - expr("INTERVAL 1 MINUTE")) / lit(900000000L)) * lit(900L))

  /** Generic epoch-aligned bucket of `seconds` width (start-labeled). */
  def timeBucket(ts: Column, seconds: Long): Column =
    timestamp_seconds(floor(unix_micros(ts) / lit(seconds * 1000000L)) * lit(seconds))

  /** pandas `resample('W-SUN', label=right)` bin label: the Sunday at or
    * after the date (a Sunday maps to itself — right-closed bins).
    * Ref: utils/20251223-weight-for-streamlit.py:327-345; SURVEY §7.4 item 4. */
  def weekEndSunday(d: Column): Column =
    date_add(d, (lit(8) - dayofweek(d)) % lit(7))

  /** pandas `resample('W-{dow}')` generalization: label = the `targetDow`
    * (Spark dayofweek numbering, Sunday=1) at or after the date. */
  def weekEnd(d: Column, targetDow: Int): Column =
    date_add(d, (lit(targetDow + 7) - dayofweek(d)) % lit(7))

  /** pandas `resample('ME')` bin label: calendar month end. */
  def monthEnd(d: Column): Column = last_day(d)

  /** Mixed-format timestamp parse, errors → null.
    * Ref: pd.to_datetime(format='mixed', errors='coerce'),
    * utils/20251223-weight-for-streamlit.py:249-253. Formats tried in
    * order; first success wins. */
  def tryToTimestampMulti(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** The reference's three observed format families (SURVEY §7.4 item 10). */
  val ReferenceFormats: Seq[String] = Seq(
    "yyyy-MM-dd HH:mm:ss",   // sensor exports (ISO)
    "dd/MM/yyyy HH:mm:ss",   // electricity
    "MM/dd/yyyy HH:mm",      // weight txt (after space-normalization)
    "yyyy-MM-dd")
}
