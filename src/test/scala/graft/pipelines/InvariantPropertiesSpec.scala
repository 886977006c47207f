package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** The reference's implicit invariants as generated-input properties
  * (SURVEY §5: telescoping conservation, merge idempotence, tolerance
  * semantics) — ScalaCheck generators drive the shapes, Spark executes. */
class InvariantPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate(rng.Seed(seed))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toSeq

  test("property: ΣDelta over any cumulative series telescopes to last − first") {
    val seriesGen = for {
      n <- Gen.chooseNum(2, 60)
      incs <- Gen.listOfN(n, Gen.chooseNum(0L, 50L))
    } yield incs.scanLeft(100L)(_ + _)
    sample(seriesGen, 8, 7L).foreach { series =>
      val df = series.zipWithIndex
        .map { case (v, i) => (java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), v) }
        .toDF("ts", "v")
      val w = org.apache.spark.sql.expressions.Window.orderBy("ts")
      val total = df
        .withColumn("d", lead("v", 1).over(w) - col("v"))
        .agg(sum("d")).collect()(0).getLong(0)
      assert(total == series.last - series.head)
    }
  }

  test("property: re-merging the same sensor file adds no conflicts and no rows") {
    val dir = java.nio.file.Files.createTempDirectory("idem")
    val content =
      "﻿Timestamp,Temp,Hum\n" +
        (0 until 50).map(i => f"2025-11-20 01:$i%02d:00,${10 + i * 0.1}%.1f,${60 + i * 0.2}%.1f")
          .mkString("\n")
    java.nio.file.Files.writeString(dir.resolve("S_export_202511210000.csv"), content)
    java.nio.file.Files.writeString(dir.resolve("S_export_202511220000.csv"), content)
    val merged = SensorMergePipeline.run(spark, dir.toString)("S")
    assert(merged.count() == 50)
    assert(!merged.columns.exists(_.startsWith("!")), "identical re-merge must add no conflict columns")
  }

  test("property: tolerantEquals is reflexive incl. NaN, and symmetric-ish on random pairs") {
    val pairGen = for {
      a <- Gen.chooseNum(-1e6, 1e6)
      eps <- Gen.chooseNum(-1e-7, 1e-7)
    } yield (a, a + a.abs * eps) // within rtol
    val pairs = sample(pairGen, 40, 11L) ++ Seq((Double.NaN, Double.NaN))
    val df = pairs.toDF("a", "b")
    val bad = df.filter(!SensorMergePipeline.tolerantEquals(col("a"), col("b"))).count()
    assert(bad == 0)
    // and clear violations are detected
    val viol = Seq((1.0, 1.1), (100.0, 100.01)).toDF("a", "b")
      .filter(SensorMergePipeline.tolerantEquals(col("a"), col("b"))).count()
    assert(viol == 0)
  }

  test("property: session counts partition the events (q39 invariant)") {
    val q39 = graft.queries.SessionQueries.q39Sessionize(spark, sfDir)
    val total = q39.agg(sum("n_events")).collect()(0).getLong(0)
    val events = graft.core.Tables.events(spark, sfDir).count()
    assert(total == events, "sessions must partition all events exactly")
  }

  test("property: incremental-agg merge ≡ full recompute for ANY cut date (q58 invariant)") {
    import org.apache.spark.sql.functions._
    val o = graft.core.Tables.orders(spark, sfDir)
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("o_orderpriority")
      .agg(sum(graft.functions.ExactDecimal.cents(col("o_totalprice"))).as("tp"),
        count(lit(1)).as("n"))
    val full = partial(o).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    for (cut <- Seq("1995-06-01", "1997-01-01", "1999-12-31", "1994-01-01", "2002-01-01")) {
      val merged = partial(o.filter(col("o_orderdate") < cut))
        .unionByName(partial(o.filter(col("o_orderdate") >= cut)))
        .groupBy("o_orderpriority").agg(sum("tp").as("tp"), sum("n").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(merged == full, s"cut $cut — incl. empty-side cuts (monoid identity)")
    }
  }

  test("property: LSH candidates are a subset of brute-force near pairs (q30 vs q27 relation)") {
    val lsh = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("jaccard") >= 0.05)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.queries.TextQueries.q27NgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH must not invent pairs the exact measure rejects")
  }
}

/** ANN quality: a measured recall floor, not just plan shape. The
  * testdata embeddings are near-unstructured (nearest-centroid own-label
  * 21%, top-3 same-label 9% ≈ chance for 10 labels), so LSH recall is
  * bounded by random-collision rates — on clustered real embeddings the
  * same index recalls far more. The floor here is a sanity check that
  * the bucketing isn't degenerate (e.g. all-one-bucket or disjoint). */
class AnnRecallSpec extends SparkSpec {
  test("q32 LSH recall@3 vs q31 exact top-3 clears the random-collision floor") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(graft.queries.EmbeddingQueries.q31CosineTopK(spark, sfDir))
    val approx = pairs(graft.queries.EmbeddingQueries.q32AnnLsh(spark, sfDir))
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"ANN recall@3 = $recall%.3f (${(exact intersect approx).size}/${exact.size})")
    assert(recall > 0.02, "LSH bucketing must beat degenerate collision rates")
    // and the candidate set must be far smaller than brute force
    val nPairs = graft.queries.EmbeddingQueries.q32AnnLsh(spark, sfDir).count()
    assert(nPairs < exact.size * 2L, "LSH must prune the candidate space")
  }
}
