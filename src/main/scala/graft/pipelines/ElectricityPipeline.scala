package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** The electricity meter downsample pipeline (SURVEY P3, §7.2; ref:
  * utils/duckdb_electricity_1-minute.py:5-173 — the 10-stage CTE chain),
  * Spark-first over the reference's own CSV shape
  * (`Date,Time,P,OP`, Date in dd/MM/yyyy, cumulative counters).
  *
  * Chain: read → naive local timestamp → per-year BST boundaries
  * (broadcast) → hand-rolled BST→UTC shift → LEAD deltas → 1-minute grid
  * explode → peak/off-peak classification → per-interval rate allocation
  * (window, replacing the reference's counts self-join at :112-142) →
  * end-labeled 15-minute buckets.
  *
  * Scale notes: the reference's series is one global meter, so the LEAD
  * window is a single partition — fine at 1,273 rows (SURVEY §7.4 item 8);
  * `byKey` variants of this chain live in
  * [[graft.queries.PipelineQueries.q34ElectricityE2e]] where every window
  * is partitioned by a device key. The BST boundary table is years-count
  * rows → broadcast. The grid explode is generated executor-side.
  */
object ElectricityPipeline {

  /** Read the reference CSV shape: Date dd/MM/yyyy, Time HH:mm:ss,
    * cumulative counters P and OP. DOUBLE, not LONG: the real file
    * contains fractional readings ("650.5") which `read_csv_auto` infers
    * as doubles — a LONG schema would silently null them. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema("Date STRING, Time STRING, P DOUBLE, OP DOUBLE")
      .csv(path)
      .withColumn("LocalDateTime",
        to_timestamp(concat_ws(" ", col("Date"), col("Time")), "dd/MM/yyyy HH:mm:ss"))

  /** Stages 2-4: per-year BST windows (broadcast) + naive-local→UTC shift
    * (ref :21-55; deliberately NOT a tz conversion — SURVEY §7.4 item 6). */
  def toUtc(readings: DataFrame): DataFrame = {
    val yrs = readings.select(year(col("LocalDateTime")).as("yr")).distinct()
      .withColumn("bst_start", TimeFns.bstStart(col("yr")))
      .withColumn("bst_end", TimeFns.bstEnd(col("yr")))
    readings.join(broadcast(yrs), year(col("LocalDateTime")) === col("yr"))
      .withColumn("UTC_DateTime",
        TimeFns.localToUtc(col("LocalDateTime"), col("bst_start"), col("bst_end")))
      .drop("yr", "bst_start", "bst_end")
  }

  /** Stages 5-6: next-reading deltas via LEAD, last row dropped
    * (ref :60-74). Global meter series → single-partition window by
    * design; see class doc. */
  def deltas(utc: DataFrame): DataFrame = {
    val w = Window.orderBy("UTC_DateTime")
    utc
      .withColumn("Next_DateTime", lead("UTC_DateTime", 1).over(w))
      .withColumn("Delta_P", lead("P", 1).over(w) - col("P"))
      .withColumn("Delta_OP", lead("OP", 1).over(w) - col("OP"))
      .filter(col("Next_DateTime").isNotNull)
  }

  /** Stages 7-10: minute grid explode, peak classification, rate
    * allocation over per-interval minute counts (window instead of the
    * reference's self-join), end-labeled 15-minute buckets
    * (ref :85-172).
    *
    * Bucket usage is summed DETERMINISTICALLY: the reference's
    * `SUM(P_Value)` adds one double per minute in engine-internal order,
    * so its last bit varies by engine/partitioning wherever a bucket
    * straddles two intervals. Here each (bucket, interval) contributes a
    * single subtotal `delta * minutes_in_bucket / total_minutes` (all
    * rate minutes of one interval are equal, so this is the same number
    * with two roundings instead of `minutes` of them), and subtotals are
    * folded in interval order — bit-identical across engines and
    * partitionings, and within 1 ulp-per-term of the reference's value. */
  def fifteenMinuteUsage(deltaDf: DataFrame): DataFrame = {
    // Per-interval rate denominators (total P/OP minutes of the interval)
    // are computed HERE, at the deltas level (~1/1440th of the grid), in
    // CLOSED FORM — O(1) integer arithmetic per interval, no fold over the
    // minute sequence (a struct-accumulator `aggregate` re-walked all 1.8M
    // minutes interpreted and benched slower than the window it replaced)
    // and no post-agg window shuffle (r6 verdict item 7).
    //
    // Derivation: grid minutes are t0 + k·1min (k = 1..K, K = ⌊Δ/1min⌋),
    // so their times-of-day sit on a 1-minute lattice with fixed
    // sub-minute offset u = tod(t0) mod 1min and minute index
    // m = (M0 + k) mod 1440. Peak is tod ∈ (06:30, 23:30] (peakCategory),
    // i.e. m·1min + u ∈ (390, 1410] minutes ⟺ m ∈ [391−[u>0], 1410−[u>0]]
    // — a width-1020 index window either way (the peak span is an exact
    // multiple of the lattice step, so each full day contributes exactly
    // 1020 regardless of offset). The ≤1-day remainder is a circular-
    // interval intersection on Z₁₄₄₀. Verified against the oracle, which
    // derives the same counts by grouping the exploded grid.
    val withTotals = deltaDf
      .withColumn("_k", expr(
        "(unix_micros(Next_DateTime) - unix_micros(UTC_DateTime)) div 60000000"))
      .withColumn("_tod0", expr("pmod(unix_micros(UTC_DateTime), 86400000000)"))
      .withColumn("_u", expr("pmod(_tod0, 60000000)"))
      .withColumn("_start", expr("pmod(_tod0 div 60000000 + 1, 1440)"))
      .withColumn("_rm", expr("pmod(_k, 1440)"))
      .withColumn("_mlo", expr("IF(_u > 0, 390L, 391L)"))
      .withColumn("_mhix", expr("IF(_u > 0, 1410L, 1411L)")) // mHi + 1
      .withColumn("pmins", expr(
        """(_k div 1440) * 1020
          | + greatest(0L, least(least(_start + _rm, 1440), _mhix) - greatest(_start, _mlo))
          | + IF(_start + _rm > 1440,
          |      greatest(0L, least(_start + _rm - 1440, _mhix) - _mlo), 0L)""".stripMargin))
      .withColumn("opmins", expr("_k - pmins"))
      .drop("_k", "_tod0", "_u", "_start", "_rm", "_mlo", "_mhix")
    // The global LEAD window above leaves the whole series in ONE
    // partition, so without this the ~1400×-fanout explode below (and its
    // map-side partial aggregation) would run single-threaded. Spread the
    // interval rows across the cluster BEFORE the fanout: the shuffle
    // moves only the narrow interval rows (1/1400th of the grid), and the
    // explicit count keeps AQE from coalescing the tiny exchange back to
    // one partition. Result-invariant: everything downstream re-shuffles
    // by (Bucket, interval) and the final fold is sort_array-ordered.
    val spread = withTotals.repartition(
      deltaDf.sparkSession.sparkContext.defaultParallelism)
    val grid = spread.select(
        col("UTC_DateTime"), col("Delta_P"), col("Delta_OP"),
        col("pmins"), col("opmins"),
        explode(sequence(
          col("UTC_DateTime") + expr("INTERVAL 1 MINUTE"),
          col("Next_DateTime"),
          expr("INTERVAL 1 MINUTE"))).as("MinuteGrid"))
      .withColumn("Category", TimeFns.peakCategory(col("MinuteGrid")))
    // aggregate the 1-minute grid down to (bucket, interval) FIRST — the
    // partial aggregation combines map-side, so the only full-grid shuffle
    // carries ~15× fewer rows, with the interval denominators riding along
    // as constants (first())
    val perInterval = grid
      .withColumn("Bucket", TimeFns.timeBucket15EndLabeled(col("MinuteGrid")))
      .groupBy("Bucket", "UTC_DateTime")
      .agg(
        min("MinuteGrid").as("fm"),
        max("MinuteGrid").as("lm"),
        count(lit(1)).as("mins"),
        sum(when(col("Category") === "P", 1).otherwise(0)).as("cnt_p"),
        sum(when(col("Category") === "OP", 1).otherwise(0)).as("cnt_op"),
        first("Delta_P").as("dp"), first("Delta_OP").as("dop"),
        first("pmins").as("pmins"), first("opmins").as("opmins"))
      .withColumn("p_sub", when(col("cnt_p") > 0 && col("pmins") > 0,
        col("dp") * col("cnt_p").cast("double") / col("pmins").cast("double")))
      .withColumn("op_sub", when(col("cnt_op") > 0 && col("opmins") > 0,
        col("dop") * col("cnt_op").cast("double") / col("opmins").cast("double")))
    // ordered fold over the (≤3) per-interval subtotals; empty → NULL,
    // matching SUM-over-all-NULL semantics
    def orderedSum(subs: Column) =
      when(size(subs) > 0, aggregate(subs, lit(0.0), (acc, x) => acc + x.getField("v")))
    perInterval.groupBy("Bucket")
      .agg(
        min("fm").as("First_Minute"),
        max("lm").as("Last_Minute"),
        sum("mins").as("Minutes"),
        sort_array(collect_list(when(col("p_sub").isNotNull,
          struct(col("UTC_DateTime").as("u"), col("p_sub").as("v"))))).as("ps"),
        sort_array(collect_list(when(col("op_sub").isNotNull,
          struct(col("UTC_DateTime").as("u"), col("op_sub").as("v"))))).as("os"))
      .select(col("Bucket"), col("First_Minute"), col("Last_Minute"), col("Minutes"),
        orderedSum(col("ps")).as("P_Usage"), orderedSum(col("os")).as("OP_Usage"))
      .orderBy("Bucket")
  }

  /** Full chain: path → 15-minute usage table. */
  def run(spark: SparkSession, path: String): DataFrame =
    fifteenMinuteUsage(deltas(toUtc(read(spark, path))))

  /** The reference's run-time invariant checks (SURVEY §5.2-3), as
    * DataFrames for tests:
    * peak-boundary buckets (hour∈{6,23}, minute∈{15,30}) and the summary
    * totals whose ΣP/ΣOP must telescope to last(P)−first(P). */
  def boundaryBuckets(usage: DataFrame): DataFrame =
    usage.filter(hour(col("Bucket")).isin(6, 23) && minute(col("Bucket")).isin(15, 30))

  /** CSV sink matching the reference's `fifteen_minute_usage.csv`
    * single-file output (ref: pandas to_csv / COPY TO). */
  def writeCsv(usage: DataFrame, path: String): Unit =
    usage.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  def summary(usage: DataFrame): DataFrame =
    usage.agg(
      count(lit(1)).as("n_buckets"),
      sum("P_Usage").as("total_p"),
      sum("OP_Usage").as("total_op"),
      min("Bucket").as("first_bucket"),
      max("Bucket").as("last_bucket"))
}
