package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case coverage for the reusable temporal operators; their bulk
  * correctness is driver-proven via q38/q39/q40 against DuckDB's native
  * ASOF JOIN / IEJoin. */
class TemporalOpsSpec extends SparkSpec {

  import spark.implicits._

  test("asofJoin: no earlier mark → null; equal-ts mark wins; latest mark carried") {
    val left = Seq(
      (1L, 100L, "2025-01-01 10:00:00"),
      (1L, 101L, "2025-01-01 12:00:00"),
      (2L, 200L, "2025-01-01 09:00:00")
    ).toDF("user_id", "event_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val right = Seq(
      (1L, "2025-01-01 10:00:00", 5.0), // equal ts → counts (at-or-before)
      (1L, "2025-01-01 11:00:00", 7.0),
      (2L, "2025-01-01 09:30:00", 9.0)  // after the only user-2 reading
    ).toDF("user_id", "s", "mark").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val out = TemporalOps.asofJoin(left, right, Seq("user_id"), "ts", Seq("mark"))
      .select("event_id", "mark").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(100L).contains(5.0))  // equal-timestamp mark attaches
    assert(out(101L).contains(7.0))  // latest at-or-before
    assert(out(200L).isEmpty)        // mark is in the future → null
  }

  test("asofJoin: a NULL in the latest right row wins atomically (not an older value)") {
    // r3/r4 advice: per-column last(ignoreNulls) would skip the NULL mark at
    // 11:00 and resurrect 10:00's 5.0 — DuckDB ASOF attaches the most recent
    // ROW, nulls included. Multi-column: the second column proves the row is
    // carried atomically (11:00's tag comes with 11:00's null mark).
    val left = Seq((1L, 100L, "2025-01-01 12:00:00"))
      .toDF("user_id", "event_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val right = Seq(
      (1L, "2025-01-01 10:00:00", Some(5.0), "old"),
      (1L, "2025-01-01 11:00:00", None: Option[Double], "new")
    ).toDF("user_id", "s", "mark", "tag").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val row = TemporalOps.asofJoin(left, right, Seq("user_id"), "ts", Seq("mark", "tag"))
      .select("mark", "tag").collect().head
    assert(row.isNullAt(0), "latest row's NULL mark must win")
    assert(row.getString(1) == "new")
  }

  test("sessionize: gap strictly greater than threshold splits; exact gap does not") {
    val df = Seq(
      (1L, "2025-01-01 10:00:00"),
      (1L, "2025-01-01 10:30:00"), // exactly 30 min → same session
      (1L, "2025-01-01 11:00:01")  // 30 min + 1 s → new session
    ).toDF("user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val ids = TemporalOps.sessionize(df, Seq("user_id"), "ts", 30L * 60 * 1000000)
      .orderBy("ts").select("session_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 1L, 2L))
  }

  test("bandRangeJoin: boundary values included, cross-band pairs found") {
    val l = Seq((1L, 10.0), (2L, 20.0)).toDF("lid", "lv")
    val r = Seq((10L, 11.0), (11L, 9.0), (12L, 11.5), (13L, 19.999)).toDF("rid", "rv")
    val pairs = TemporalOps.bandRangeJoin(l, r, "lv", "rv", radius = 1.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs == Set((1L, 10L), (1L, 11L), (2L, 13L))) // 11.5 is outside
  }

  test("bandRangeJoin: result is band-width invariant (narrow, default, wide)") {
    // the decomposition contract: any positive width yields the same pair
    // set; only candidate volume moves. Fractional values + exact-boundary
    // pairs probe the fp band-edge handling at every width.
    val l = (1 to 200).map(i => (i.toLong, i * 0.37)).toDF("lid", "lv")
    val r = (1 to 200).map(i => (i.toLong, i * 0.41 - 3.0)).toDF("rid", "rv")
    def pairs(w: Double) =
      TemporalOps.bandRangeJoin(l, r, "lv", "rv", radius = 1.7, bandWidth = w)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val default = TemporalOps.bandRangeJoin(l, r, "lv", "rv", radius = 1.7)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(default.nonEmpty)
    for (w <- Seq(0.1, 0.63, 1.7, 5.0, 100.0))
      assert(pairs(w) == default, s"width $w changed the pair set")
  }

  test("bandWidthFor: per-band build rows stay near target as density grows 10x") {
    // 10× the rows over the SAME value domain: a fixed radius-width band
    // would hold 10× the rows; the derived width shrinks instead and the
    // per-band occupancy bound survives the scale-up (uniform data → a
    // small constant skew factor over the target)
    def uniform(n: Int) = (1 to n).map(i => (i.toLong, i * (1000.0 / n))).toDF("rid", "rv")
    for (n <- Seq(2000, 20000)) {
      val build = uniform(n)
      val w = TemporalOps.bandWidthFor(build, "rv", radius = 50.0, targetPerBand = 128)
      val perBand = build.withColumn("_band", floor(col("rv") / w))
        .groupBy("_band").count().agg(max("count")).head().getLong(0)
      assert(perBand <= 4 * 128, s"n=$n: $perBand rows in the hottest band (width $w)")
      // and the probe explode factor stays bounded by the cap
      val bandsPerProbe = math.floor((0.0 + 50.0) / w) - math.floor((0.0 - 50.0) / w) + 1
      assert(bandsPerProbe <= 64, s"n=$n: $bandsPerProbe bands per probe")
    }
  }

  test("bandWidthFor: explode-factor floor engages on ultra-dense domains") {
    // 100k rows on a span of 1.0 with radius 10: the density term alone
    // would ask for ~1e-2-width bands → thousands of bands per probe; the
    // floor caps it at 2r/(cap−2)
    val build = (1 to 100000).map(i => (i.toLong, i / 100000.0)).toDF("rid", "rv")
    val w = TemporalOps.bandWidthFor(build, "rv", radius = 10.0,
      targetPerBand = 16, maxBandsPerProbe = 64)
    assert(w >= 2.0 * 10.0 / 62.0 - 1e-12, s"floor must engage, got $w")
    val bandsPerProbe = 2.0 * 10.0 / w + 2
    assert(bandsPerProbe <= 64 + 1e-9)
  }

  test("dedupeKeepLast keeps the max-order row per key") {
    val df = Seq((1L, 1L, "a"), (1L, 3L, "b"), (1L, 2L, "c"), (2L, 1L, "d"))
      .toDF("k", "seq", "v")
    val out = TemporalOps.dedupeKeepLast(df, Seq("k"), Seq("seq"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "b", 2L -> "d"))
  }
}
