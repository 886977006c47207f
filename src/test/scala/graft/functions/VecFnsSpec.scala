package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecFnsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*) = array(xs.map(x => lit(x.toFloat)): _*)

  test("dot / norm / cosine on known vectors") {
    val out = Seq(1).toDF("i").select(
      VecFns.dot(vec(1, 2, 3), vec(4, 5, 6)).as("d"),
      VecFns.norm(vec(3, 4)).as("n"),
      VecFns.cosine(vec(1, 0), vec(0, 1)).as("c_orth"),
      VecFns.cosine(vec(2, 2), vec(4, 4)).as("c_par"))
      .as[(Double, Double, Double, Double)].collect()(0)
    assert(out._1 === 32.0)
    assert(out._2 === 5.0)
    assert(math.abs(out._3) < 1e-12)
    assert(math.abs(out._4 - 1.0) < 1e-12)
  }

  test("l2DistSq") {
    val out = Seq(1).toDF("i")
      .select(VecFns.l2DistSq(vec(1, 2), vec(4, 6))).as[Double].collect()(0)
    assert(out === 25.0)
  }

  test("rhpBucket is deterministic and within [0, 2^8)") {
    val out = Seq(1).toDF("i").select(
      VecFns.rhpBucket(vec(1, 2, 3, 4), 4, 8).as("b1"),
      VecFns.rhpBucket(vec(1, 2, 3, 4), 4, 8).as("b2"),
      VecFns.rhpBucket(vec(-1, -2, -3, -4), 4, 8).as("b3"))
      .as[(Long, Long, Long)].collect()(0)
    assert(out._1 === out._2)
    assert(out._1 >= 0L && out._1 < 256L)
    // negating the vector flips every nonzero-dot bit → complementary bucket
    assert((out._1 ^ out._3) === 255L)
  }
}
