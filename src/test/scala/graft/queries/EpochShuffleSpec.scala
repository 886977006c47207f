package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q111: the dataloader-permutation properties. */
class EpochShuffleSpec extends SparkSpec {

  private lazy val rows = CurationQueries.q111EpochShuffle(spark, sfDir).collect()
    .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))

  test("each epoch is a bijection over the corpus") {
    val docs = graft.core.Tables.documents(spark, sfDir).count()
    (0 to 1).foreach { ep =>
      val e = rows.filter(_._1 == ep)
      assert(e.length.toLong == docs, s"epoch $ep covers ${e.length} of $docs docs")
      assert(e.map(_._4).distinct.length == e.length, s"epoch $ep repeats a doc")
      e.groupBy(_._2).foreach { case (sh, g) =>
        assert(g.map(_._3).sorted.toSeq == (1 to g.length), s"epoch $ep shard $sh positions not contiguous")
      }
    }
  }

  test("epochs order the corpus differently (the point of re-shuffling)") {
    def order(ep: Int) = rows.filter(_._1 == ep).sortBy(t => (t._2, t._3)).map(_._4).toSeq
    assert(order(0) != order(1), "epoch 0 and 1 must disagree on ordering")
  }

  test("plan: windows are keyed by (epoch, shard), never a global sort") {
    val p = CurationQueries.q111EpochShuffle(spark, sfDir)
      .queryExecution.executedPlan.toString
    p.linesIterator.filter(_.trim.startsWith("Window ")).foreach { l =>
      assert(l.contains("epoch") && l.contains("shard"), s"unkeyed window: $l")
    }
  }
}
