package graft.expr

import graft.SparkSpec
import graft.functions.VecFns
import org.apache.spark.sql.functions._

class VecExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def randVecs(n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    (0L until n).map(i => i -> Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  test("native vec_dot is bit-identical to the HOF fold") {
    val df = randVecs(200, 64).toDF("id", "v")
      .withColumn("w", reverse(col("v")))
    val out = df.select(
      NativeVecFns.dot(spark, col("v"), col("w")).as("native"),
      VecFns.dot(col("v"), col("w")).as("hof")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("native vec_l2_sq is bit-identical to the HOF fold; mixed float/double sides work") {
    val df = randVecs(100, 32).toDF("id", "v")
      .withColumn("w", transform(reverse(col("v")), x => x.cast("double")))
    val out = df.select(
      NativeVecFns.l2DistSq(spark, col("v"), col("w")).as("native"),
      VecFns.l2DistSq(col("v"), col("w")).as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null array → null; known dot value") {
    val df = Seq(
      (Some(Seq(1f, 2f, 3f)), Some(Seq(4f, 5f, 6f))),
      (None, Some(Seq(1f, 1f, 1f)))).toDF("a", "b")
    val rows = df.select(NativeVecFns.dot(spark, col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).isNullAt(0))
  }

  test("native vec_rhp_bucket is bit-identical to the HOF fold (incl. negatives, odd dims)") {
    for (dim <- Seq(3, 17, 64); nPlanes <- Seq(1, 8, 16)) {
      val df = randVecs(200, dim).toDF("id", "v")
      val out = df.select(
        NativeVecFns.rhpBucket(spark, col("v"), nPlanes).as("native"),
        VecFns.rhpBucket(col("v"), dim, nPlanes).as("hof")).collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"dim=$dim nPlanes=$nPlanes native=${r.getLong(0)} hof=${r.getLong(1)}"))
      val buckets = out.map(_.getLong(0)).toSet
      assert(buckets.forall(b => b >= 0 && b < (1L << nPlanes)))
    }
  }

  test("whole-stage codegen handles the expression (no fallback errors) and beats HOF") {
    val df = randVecs(2000, 64).toDF("id", "v").cache()
    df.count()
    val joined = df.as("a").join(df.as("b"), col("a.id") =!= col("b.id"))
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      joined.select(sum(c)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val tNative = time(NativeVecFns.dot(spark, col("a.v"), col("b.v")))
    val tHof = time(VecFns.dot(col("a.v"), col("b.v")))
    info(f"native=$tNative%.2fs hof=$tHof%.2fs speedup=${tHof / tNative}%.1fx")
    assert(tNative < tHof, "native codegen dot should not be slower than the interpreted HOF")
    df.unpersist()
  }

  test("native vec_matvec is bit-identical to the HOF rotateColumn fold") {
    val dim = 16
    val rnd = new scala.util.Random(11)
    val rFlat = IndexedSeq.fill(dim * dim)(rnd.nextDouble() * 2 - 1)
    val rl = typedLit(rFlat)
    val df = randVecs(150, dim).toDF("id", "v")
    val out = df.select(
      NativeVecFns.matVec(spark, rl, col("v")).as("native"),
      graft.ml.Opq.rotateColumnHof(rl, dim, col("v")).as("hof")).collect()
    out.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(a.length == dim && a == b, s"native=$a hof=$b")
    }
  }
}

class TopKAggSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  test("top_k_by_score ≡ window row_number top-k (ties, partials, merges)") {
    val rnd = new scala.util.Random(11)
    // many groups, deliberate score ties, enough rows to force partial merges
    val rows = (0 until 20000).map { i =>
      (i % 37L, math.floor(rnd.nextDouble() * 20) / 20.0, i.toLong)
    }
    val df = rows.toDF("g", "score", "id").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(TopKAgg.topKByScore(spark, col("score"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("t.score"), col("t.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).sorted.toSeq
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("g"), col("rank"), col("score"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).sorted.toSeq
    assert(viaAgg == viaWindow)
  }

  test("top_k_by_score NaN scores are skipped (NaN-last window semantics)") {
    // a NaN that lands while the buffer is not yet full must NOT block
    // later genuinely-better candidates (NaN compares false under > and
    // ==, so an admitted NaN at the tail would veto everything after it)
    val df = Seq(
      (1L, Double.NaN, 1L), (1L, 0.2, 2L), (1L, 0.9, 3L), (1L, Double.NaN, 4L),
      (2L, Double.NaN, 5L), (2L, Double.NaN, 6L) // all-NaN group → empty array
    ).toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(TopKAgg.topKByScore(spark, col("score"), col("id"), 2).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(t => (t.getDouble(0), t.getLong(1)))).toMap
    assert(out(1L) == Seq((0.9, 3L), (0.2, 2L)))
    assert(out(2L).isEmpty)
  }

  test("top_k_by_score groups smaller than k return all rows in order") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L)).toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(TopKAgg.topKByScore(spark, col("score"), col("id"), 5).as("top"))
      .select(explode(col("top")).as("t")).select("t.score", "t.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((0.9, 11L), (0.5, 10L)))
  }
}
