package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q100 closed-form OLS: exactness on hand-computed fixtures, the
  * single-day convention, and summation-order independence. */
class OlsTrendSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def frame(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "day", "y")
  }

  test("perfect line recovers slope and intercept exactly") {
    // user 1: y = 250 + 37x cents over days 100..104
    val rows = (0L to 4L).map(x => (1L, 100L + x, 250L + 37L * x))
    val r = SessionQueries.olsTrendFrom(frame(rows)).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 5, "n")
    assert(r(0).getLong(2) == 37L * 10000, s"slope_bp ${r(0).getLong(2)}")
    assert(r(0).getLong(3) == 250L * 10000, s"intercept_bp ${r(0).getLong(3)}")
  }

  test("noisy fixture matches the hand-computed closed form") {
    // x = 0..3, y = 10, 12, 11, 15
    // n=4 Σx=6 Σy=48 Σxy=79 Σx²=14 → den=4·14−36=20
    // slope = (4·79−6·48)/20 = 28/20 = 1.4 → 14000 bp
    // intercept = (48·14−6·79)/20 = 198/20 = 9.9 → 99000 bp
    val rows = Seq((7L, 50L, 10L), (7L, 51L, 12L), (7L, 52L, 11L), (7L, 53L, 15L))
    val r = SessionQueries.olsTrendFrom(frame(rows)).collect()(0)
    assert(r.getLong(2) == 14000, s"slope_bp ${r.getLong(2)}")
    assert(r.getLong(3) == 99000, s"intercept_bp ${r.getLong(3)}")
  }

  test("a single-day user yields the 0/0 convention, not an error") {
    val rows = Seq((9L, 77L, 100L), (9L, 77L, 200L))
    val r = SessionQueries.olsTrendFrom(frame(rows)).collect()(0)
    assert(r.getLong(2) == 0 && r.getLong(3) == 0)
  }

  test("result is independent of partitioning (integer sufficient stats)") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map(i =>
      ((i % 7).toLong, (i / 7).toLong, rnd.nextInt(100000).toLong))
    val one = SessionQueries.olsTrendFrom(frame(rows).repartition(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val many = SessionQueries.olsTrendFrom(frame(rows).repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(one == many, "slope must not depend on summation order")
  }
}
