package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable time-series operators — the library surface behind the
  * q38/q39/q40 driver queries, which prove these exact implementations
  * against DuckDB's NATIVE operators (ASOF JOIN, IEJoin) rather than
  * self-consistency. Each is a composition of existing Spark operators
  * chosen for its 100 TB plan shape (keyed window / bucket equi-join —
  * never a theta-join that Spark would execute as a nested loop).
  */
object TemporalOps {

  /** Backward as-of join: attach to every left row the most recent
    * `valueCols` from `right` at-or-before its `ts`, per `by` key —
    * one shuffle on the key, via union + ordered last-non-null window
    * (right rows sort before left rows at equal timestamps).
    *
    * The right row's value columns travel as ONE struct, so the latest
    * right row wins atomically — including any NULL fields it carries
    * (per-column `last(ignoreNulls)` would skip a NULL and resurrect an
    * older row's value, which is not what DuckDB's ASOF JOIN returns).
    *
    * Requirements: `right` has at most one row per (by, ts) — pre-dedupe
    * with [[dedupeKeepLast]] if not (ties make as-of ambiguous in any
    * engine); `valueCols` must not collide with left column names. */
  def asofJoin(left: DataFrame, right: DataFrame, by: Seq[String], ts: String,
               valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty && !valueCols.exists(left.columns.contains),
      "valueCols must be non-empty and absent from the left side")
    val payloadType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val lTagged = left.withColumn("_asof_side", lit(1))
      .withColumn("_asof_payload", lit(null).cast(payloadType))
    val rBase = right
      .select((by :+ ts).map(c => col(s"`$c`"))
        :+ struct(valueCols.map(c => col(s"`$c`")): _*).as("_asof_payload"): _*)
      .withColumn("_asof_side", lit(0))
    val rTagged = left.columns.toSeq.diff(by :+ ts).foldLeft(rBase) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(by.map(c => col(s"`$c`")): _*)
      .orderBy(col(s"`$ts`").asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("_asof_payload", last("_asof_payload", ignoreNulls = true).over(w))
    filled.filter(col("_asof_side") === 1)
      .select(left.columns.toSeq.map(c => col(s"`$c`"))
        ++ valueCols.map(c => col("_asof_payload").getField(c).as(c)): _*)
  }

  /** Gap-based sessionization: adds a `session_id` column (1-based, per
    * `by` key, ordered by (ts, tieBreak)) where a new session starts
    * whenever the gap to the previous row exceeds `gapMicros`. One keyed
    * shuffle; the batch twin of
    * [[graft.streaming.StreamingOps.sessionize]]. */
  def sessionize(df: DataFrame, by: Seq[String], ts: String, gapMicros: Long,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = Window.partitionBy(by.map(c => col(s"`$c`")): _*)
      .orderBy((ts +: tieBreak).map(c => col(s"`$c`").asc): _*)
    df.withColumn("_prev_ts", lag(ts, 1).over(ord))
      .withColumn("_new", when(col("_prev_ts").isNull
        || unix_micros(col(s"`$ts`")) - unix_micros(col("_prev_ts")) > gapMicros, 1L)
        .otherwise(0L))
      .withColumn("session_id",
        sum("_new").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_ts", "_new")
  }

  /** Scalar band range join: all (left, right) pairs with
    * |left.leftVal − right.rightVal| ≤ radius. A direct theta-join plans
    * as a nested-loop cartesian in Spark; decomposing into width-`w`
    * bands turns it into an equi-join on the band key + residual filter.
    * Each probe row explodes into every band overlapping
    * [v − radius, v + radius] (computed with the SAME fp expressions the
    * residual filter evaluates, and correctly-rounded division is
    * monotone — so the band cover is a superset of the true range and
    * band-edge fp behavior cannot affect membership).
    *
    * `bandWidth` defaults to `radius` (3 bands per probe — the original,
    * oracle-pinned decomposition). The RESULT is invariant to the width;
    * only the candidate volume changes. On a dense value domain pass
    * [[bandWidthFor]]'s data-derived width instead: radius-width bands
    * on a domain holding millions of rows per radius would make every
    * band a quadratic hot spot, the same candidate bomb a fixed LSH
    * band count creates (see `VecFns.lshBitsFor`).
    * Column names of the two sides must be disjoint. */
  def bandRangeJoin(left: DataFrame, right: DataFrame,
                    leftVal: String, rightVal: String, radius: Double,
                    bandWidth: Double = Double.NaN): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "band range join requires disjoint column names")
    val w = if (bandWidth.isNaN) radius else bandWidth
    require(w > 0, s"band width must be positive, got $w")
    val lo: Column = floor((col(s"`$leftVal`") - radius) / w)
    val hi: Column = floor((col(s"`$leftVal`") + radius) / w)
    val probe = left.withColumn("_band", explode(sequence(lo, hi)))
    val build = right.withColumn("_band", floor(col(s"`$rightVal`") / w))
    // residual kept in two-sided form (not abs(a−b) ≤ r): a±r is exact
    // fp arithmetic on the probe constant, matching how a range engine
    // (and the DuckDB IEJoin oracle) evaluates BETWEEN — an abs()
    // difference could flip membership of exact-boundary pairs
    probe.join(build, Seq("_band"))
      .filter(col(s"`$rightVal`") >= col(s"`$leftVal`") - radius
        && col(s"`$rightVal`") <= col(s"`$leftVal`") + radius)
      .drop("_band")
  }

  /** Data-derived band width for [[bandRangeJoin]] — the range-join twin
    * of `VecFns.lshBitsFor`: pick the width from the BUILD side's value
    * density so per-band row count stays ≈ `targetPerBand` as the corpus
    * grows, instead of letting a fixed radius-width band hold
    * density × radius rows (quadratic candidates on a dense domain).
    *
    * width = span · targetPerBand / n (uniform-density estimate),
    * floored at 2·radius / (maxBandsPerProbe − 2) so the probe explode
    * factor stays bounded — the two knobs trade candidate volume against
    * probe duplication exactly like LSH bucket size vs band count.
    * One cheap (count, min, max) scan of the build side; run it once and
    * reuse the width across queries against the same snapshot. */
  def bandWidthFor(build: DataFrame, valueCol: String, radius: Double,
                   targetPerBand: Long = 1024, maxBandsPerProbe: Int = 64): Double = {
    require(radius > 0 && targetPerBand > 0 && maxBandsPerProbe > 2,
      "need radius > 0, targetPerBand > 0, maxBandsPerProbe > 2")
    val r = build.agg(count(lit(1)), min(col(s"`$valueCol`").cast("double")),
      max(col(s"`$valueCol`").cast("double"))).head()
    val n = r.getLong(0)
    if (n == 0 || r.isNullAt(1)) radius
    else {
      val span = r.getDouble(2) - r.getDouble(1)
      if (span <= 0) radius // single-point domain: any width works
      else {
        val dense = span * targetPerBand.toDouble / n.toDouble
        val explodeFloor = 2.0 * radius / (maxBandsPerProbe - 2).toDouble
        math.max(dense, explodeFloor)
      }
    }
  }

  private val WeekRule = "W-(SUN|MON|TUE|WED|THU|FRI|SAT)".r
  private val MinRule = "(\\d+)min".r
  private val DowNumber = Map( // Spark dayofweek numbering (Sunday = 1)
    "SUN" -> 1, "MON" -> 2, "TUE" -> 3, "WED" -> 4, "THU" -> 5, "FRI" -> 6, "SAT" -> 7)

  /** pandas-style resample bin label (right-closed, end-labeled — the
    * reference's convention throughout): `"W-SUN"`…`"W-SAT"` → the
    * target weekday at-or-after the date; `"ME"` → calendar month end;
    * `"<n>min"` → epoch-aligned n-minute bucket (start-labeled; compose
    * with [[graft.functions.TimeFns.timeBucket15EndLabeled]] for the
    * end-labeled meter variant). */
  def resampleLabel(ts: Column, rule: String): Column = rule match {
    case WeekRule(dow) => graft.functions.TimeFns.weekEnd(to_date(ts), DowNumber(dow))
    case "ME" => graft.functions.TimeFns.monthEnd(to_date(ts))
    case MinRule(n) => graft.functions.TimeFns.timeBucket(ts, n.toLong * 60L)
    case other => throw new IllegalArgumentException(s"unsupported resample rule: $other")
  }

  /** `df.resample(rule).agg(...)`: group rows into pandas-style bins of
    * `rule` over `tsCol`, labeled `period_end`. The reference's weekly /
    * monthly weight resamples are this operator with mean aggregates
    * (WeightPipeline routes through here — oracle-proven via p1/q21). */
  def resample(df: DataFrame, tsCol: String, rule: String,
               aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "resample needs at least one aggregate")
    df.groupBy(resampleLabel(col(s"`$tsCol`"), rule).as("period_end"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Keep the last row per key under `order` (ascending — the LAST in
    * that order wins), e.g. latest-record dedup by (key, seq). */
  def dedupeKeepLast(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(c => col(s"`$c`")): _*)
      .orderBy(order.map(c => col(s"`$c`").desc): _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
