package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The join-MV delta algebra must be EXACT (set-equal to the blind
  * recompute, no dedup pass hiding double counting) and its delta terms
  * must broadcast — the property that makes the refresh shuffle-free at
  * 100 TB. q95 proves the same algebra through the DuckDB oracle; this
  * spec proves it at row level and pins the physical plan. */
class IncrementalJoinViewSpec extends SparkSpec {

  private def parts() = {
    val cut = "1998-01-01"
    val o = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    val l = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_linenumber")
    val o0 = o.filter(col("o_orderdate") < cut)
    val dO = o.filter(col("o_orderdate") >= cut)
    val l0 = l.filter(col("l_linenumber") <= 4)
    val dL = l.filter(col("l_linenumber") > 4)
    (o, l, o0, dO, l0, dL)
  }
  private val cond = col("o_orderkey") === col("l_orderkey")

  test("refresh(state, Δ) is set-equal to the full recompute") {
    val (o, l, o0, dO, l0, dL) = parts()
    val maintained =
      IncrementalJoinView.refresh(o0.join(l0, cond), o0, dO, l0, dL, cond)
    val recompute = o.join(l, cond)
    assert(maintained.count() === recompute.count())
    assert(maintained.exceptAll(recompute).isEmpty &&
      recompute.exceptAll(maintained).isEmpty)
  }

  test("the four terms partition the join — disjoint, counts add up") {
    val (o, l, o0, dO, l0, dL) = parts()
    // both splits must be non-trivial or the test proves nothing
    assert(dO.count() > 0 && dL.count() > 0)
    val termCounts = (o0.join(l0, cond) +:
      IncrementalJoinView.deltaTerms(o0, dO, l0, dL, cond)).map(_.count())
    assert(termCounts.sum === o.join(l, cond).count())
  }

  test("every delta term plans as a broadcast hash join (no shuffle)") {
    val (_, _, o0, dO, l0, dL) = parts()
    IncrementalJoinView.deltaTerms(o0, dO, l0, dL, cond).foreach { t =>
      val p = t.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"delta term must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    }
  }
}
