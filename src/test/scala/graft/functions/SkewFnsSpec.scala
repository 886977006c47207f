package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewFnsSpec extends SparkSpec {

  import spark.implicits._

  test("salted aggregation ≡ plain aggregation on a skewed distribution") {
    // 90% of rows share one key — the classic straggler shape
    val rows = (0 until 5000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, i.toLong, i * 0.5)
    }
    val df = rows.toDF("k", "id", "v")
    val plain = df.groupBy("k").agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = SkewFns.saltedSumCount(df, Seq("k"), "v", buckets = 8)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n)
      assert(math.abs(salted(k)._1 - s) < 1e-6)
    }
  }

  test("salted aggregation spreads the hot key across partial groups") {
    val rows = (0 until 2000).map(i => ("hot", i.toLong, 1.0))
    val df = rows.toDF("k", "id", "v")
    val partials = df
      .withColumn("_salt", pmod(hash(col("id"), col("v")), lit(8)))
      .groupBy("k", "_salt").count()
    assert(partials.count() > 1, "salt must split the hot key")
  }

  test("salted broadcast join ≡ plain inner join (incl. hot key)") {
    val big = (0 until 3000).map(i => (if (i % 5 == 0) i % 13 else 1, i.toLong))
      .toDF("k", "id")
    val small = (0 until 13).map(i => (i, s"dim$i")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val salted = SkewFns.saltedBroadcastJoin(big, small, "k", buckets = 8)
      .select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(plain == salted)
  }

  test("property: salted counts match plain counts across bucket/key shapes") {
    // scalacheck-driven shapes sampled deterministically
    val gen = org.scalacheck.Gen.zip(
      org.scalacheck.Gen.chooseNum(1, 32), org.scalacheck.Gen.chooseNum(1, 7))
    val seed = org.scalacheck.rng.Seed(42L)
    val shapes = Iterator.iterate(seed)(_.next).take(5)
      .flatMap(sd => gen.apply(org.scalacheck.Gen.Parameters.default, sd)).toSeq
    shapes.foreach { case (buckets, nKeys) =>
      val rows = (0 until 500).map(i => (s"k${i % nKeys}", i.toLong, 1.0))
      val df = rows.toDF("k", "id", "v")
      val plain = df.groupBy("k").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val salted = SkewFns.saltedSumCount(df, Seq("k"), "v", buckets).collect()
        .map(r => (r.getString(0), r.getLong(2))).toMap
      assert(plain == salted, s"buckets=$buckets nKeys=$nKeys")
    }
  }
}
