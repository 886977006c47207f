package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch guarantees: one-sided error, mergeability, bounded
  * cell count — the properties that make it safe at fixed memory. */
class CountMinSpec extends SparkSpec {

  private val w = 64

  private def hashed(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("h")
  }

  /** Zipf-flavored stream over 100 distinct items (item i appears
    * ~1000/i times), hashes already in [0, P). */
  private lazy val stream: Seq[Long] =
    (1 to 100).flatMap(i => Seq.fill(1000 / i)(i * 7919L % CountMin.P))

  test("estimates never undercount (one-sided error)") {
    val cms = CountMin.sketch(hashed(stream), "h", w)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = stream.groupBy(identity).map { case (h, occ) => h -> occ.size.toLong }
    exact.foreach { case (h, freq) =>
      val est = (0 until CountMin.depth).map { j =>
        val b = ((h * CountMin.RowsA(j) + CountMin.RowsB(j)) % CountMin.P) % w
        cms((j, b))
      }.min
      assert(est >= freq, s"item $h: est $est < exact $freq — CMS must only overcount")
    }
  }

  test("sketch of a union equals cellwise merge of the parts") {
    val (left, right) = stream.splitAt(stream.size / 2)
    val whole = CountMin.sketch(hashed(stream), "h", w)
    val merged = CountMin.merge(
      CountMin.sketch(hashed(left), "h", w),
      CountMin.sketch(hashed(right), "h", w))
    val a = whole.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val b = merged.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "merge(sketch(A), sketch(B)) must equal sketch(A ∪ B)")
  }

  test("cell count is bounded by d×w regardless of item count") {
    val n = CountMin.sketch(hashed(stream), "h", w).count()
    assert(n <= CountMin.depth.toLong * w, s"$n cells exceeds d×w bound")
  }

  test("q99: estimates cover the exact top-20 with est >= freq") {
    val rows = graft.queries.CurationQueries.q99CountMinFreq(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val freq = r.getLong(2); val est = r.getLong(3); val over = r.getLong(4)
      assert(est >= freq, s"token ${r.getString(1)} undercounted")
      assert(over == est - freq)
    }
  }
}
