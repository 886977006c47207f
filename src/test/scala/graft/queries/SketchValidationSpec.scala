package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Accuracy validation for sketch-based queries whose benched form is
  * deliberately sketch-only (the bench prices the production path; the
  * expensive exact-sort comparison lives here instead of in the driver
  * query — VERDICT r5 "q59 cost split"). */
class SketchValidationSpec extends SparkSpec {

  test("q59 sketch lands within ±5 percentile ranks of the exact quantiles") {
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        // ONE exact-percentile buffer for all five ranks (array form) —
        // five separate calls would sort the group five times
        expr("percentile(l_extendedprice, array(0.45, 0.5, 0.55, 0.94, 0.99))").as("ex"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)").as("ap"),
        max(col("l_extendedprice")).as("mx"))
      .select(col("l_returnflag"),
        (element_at(col("ap"), 1) >= element_at(col("ex"), 1) &&
          element_at(col("ap"), 1) <= element_at(col("ex"), 3)).as("ok50"),
        (element_at(col("ap"), 2) >= element_at(col("ex"), 4) &&
          element_at(col("ap"), 2) <= col("mx")).as("ok99"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1), s"${r.getString(0)}: approx p50 outside [p45, p55]")
      assert(r.getBoolean(2), s"${r.getString(0)}: approx p99 outside [p94, max]")
    }
  }
}
