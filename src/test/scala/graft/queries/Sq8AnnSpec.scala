package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQ8 scalar-quantization properties (q97): the codec's error bound,
  * the search quality it preserves, and the plan shape of the search.
  */
class Sq8AnnSpec extends SparkSpec {

  private val dim = 16

  /** Same clustered fixture as EmbeddingQueriesSpec — the regime where
    * nearest-neighbor structure exists to preserve. */
  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(5, dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    val rows = (0 until 200).map { i =>
      val c = centers(i % 5)
      val v = c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f).toSeq
      (i.toLong, v)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("per-dim reconstruction error is bounded by step/2") {
    val e = clustered
    // per-dim spans, driver-side, to compute each dim's step
    val spans = e.agg(
      array((0 until dim).map(i => min(element_at(col("embedding"), i + 1).cast("double"))): _*).as("mins"),
      array((0 until dim).map(i => max(element_at(col("embedding"), i + 1).cast("double"))): _*).as("maxs"))
      .collect()(0)
    val mins = spans.getSeq[Double](0)
    val maxs = spans.getSeq[Double](1)
    val rows = EmbeddingQueries.sq8Recon(e, dim).collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](1)
      val rec = r.getSeq[Double](2)
      (0 until dim).foreach { i =>
        val step = (maxs(i) - mins(i)) / 255.0
        val err = math.abs(rec(i) - x(i).toDouble)
        assert(err <= step / 2 + 1e-12,
          s"dim $i err $err exceeds step/2 = ${step / 2}")
      }
    }
  }

  test("reconstructed vectors preserve top-3 neighbor recall on clustered data") {
    val truth = graft.ml.BlockTopK.cosineTopK(clustered, 3)
      .collect().map(r => (r.vec_id, r.neighbor_id)).toSet
    val rec = EmbeddingQueries.sq8Recon(clustered, dim)
      .select(col("vec_id"),
        col("recon").cast("array<float>").as("embedding"))
    val approx = graft.ml.BlockTopK.cosineTopK(rec, 3)
      .collect().map(r => (r.vec_id, r.neighbor_id)).toSet
    val recall = (truth & approx).size.toDouble / truth.size
    info(f"SQ8 top-3 recall vs float truth: $recall%.3f")
    // 256 levels over a ~2.4-wide span is a ~0.005 grid — quantization
    // noise is far below the cluster separation, so recall stays high
    assert(recall >= 0.9, f"SQ8 recall $recall%.3f below floor")
  }

  test("q97 search plan: bucket equi-join, no cartesian product") {
    val plan = EmbeddingQueries.q97Sq8Ann(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "SQ8 search must stay a bucket equi-join")
    // the one BroadcastNestedLoopJoin allowed is the 1-row stats frame
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 2, s"unexpected non-broadcast-stats nested loop joins: $bnlj")
  }
}
