package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q98 hard-negative mining invariants on the sf0.001 corpus. */
class HardNegativesSpec extends SparkSpec {

  private lazy val result = RetrievalQueries.q98HardNegatives(spark, sfDir)
    .collect()

  test("per query: at most 5 negatives, neg_rank contiguous from 1") {
    val byQuery = result.groupBy(_.getInt(0))
    assert(byQuery.nonEmpty, "no negatives mined at all")
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 5, s"query $q has ${rows.length} negatives")
      val ranks = rows.map(_.getInt(3)).sorted
      assert(ranks.toSeq == (1 to rows.length), s"query $q ranks $ranks not contiguous")
    }
  }

  test("a negative is never the gold document itself") {
    result.foreach { r =>
      assert(r.getLong(1) != r.getLong(2),
        s"query ${r.getInt(0)}: gold doc ${r.getLong(1)} returned as its own negative")
    }
  }

  test("no mined negative is near-dup-connected to its gold") {
    val edges = TextQueries.nearDupEdges(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    result.foreach { r =>
      val pair = (r.getLong(1), r.getLong(2))
      assert(!edges.contains(pair),
        s"false negative survived: gold/neg pair $pair is a near-dup edge")
    }
  }

  test("plan: no cartesian product; edge pass is a broadcast probe") {
    val plan = RetrievalQueries.q98HardNegatives(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "q98 must not cross-join")
  }
}
