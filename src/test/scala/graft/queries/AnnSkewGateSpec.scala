package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew gate for the ANN TIER (the q115/q116 treatment applied to the
  * search join): the cid candidate equi-join assumes roughly balanced
  * cells, but real clustered corpora have Zipf cell occupancy — q139's
  * pinned hot-cell corpus (~22% of vectors in one cell) makes that
  * concrete, and this spec turns the "AQE handles it" claim into
  * measured bounds + a plan assertion that would fail if the lever ever
  * stopped firing.
  *
  * Measured here (sf0.001; the sf0.01 numbers quoted in BASELINE.md come
  * from the same code):
  *  - the hot corpus really is hot AFTER training: max cell share of
  *    the TRAINED assignment ≥ 15%. The corpus plants the hot mass as
  *    exact duplicates (the web-corpus boilerplate shape) precisely
  *    because training dissolves a merely-dense noisy region — a
  *    0.7/0.3 hot mixture measured only 7% max cell share after
  *    k-means split it — while duplicates all land in one cell by the
  *    deterministic (dist, cid) tiebreak;
  *  - naive HashPartitioning on cid funnels that share into one task;
  *  - AQE's OptimizeSkewedJoin splits the hot partition on the REAL
  *    q139 search join (plan-asserted, results unchanged) — the same
  *    floored-threshold recipe as SkewGateSpec (toy-scale partitions
  *    compress under the byte thresholds; the mechanism is identical at
  *    production sizes).
  */
class AnnSkewGateSpec extends SparkSpec {

  private val Parts = 32

  private def perTask(df: DataFrame, exprs: org.apache.spark.sql.Column*): Seq[Long] =
    df.repartition(Parts, exprs: _*)
      .select(spark_partition_id().as("p"))
      .groupBy("p").count().collect().map(_.getLong(1)).toSeq

  private def corpus = EmbeddingQueries.hotCellCorpus(
    graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))

  private def trained = {
    val (cents, _) = graft.ml.KMeans.fit(corpus, 32, 2)
    cents
  }

  test("hot-cell corpus: one trained cell holds >=15% of the corpus; cid layout funnels it into one task") {
    val e = corpus
    val n = e.count().toDouble
    val cents = trained
    val asg = graft.ml.KMeans.assign(e, cents).select("vec_id", "cid")
    val hotShare = asg.groupBy("cid").count()
      .agg(max("count")).first().getLong(0) / n
    assert(hotShare > 0.15, s"hot cell share $hotShare must be >= 0.15")
    // the search join keys on cid — naive HashPartitioning concentrates
    // the hot cell's whole mass in a single task
    val naive = perTask(asg, col("cid"))
    val naiveShare = naive.max / n
    assert(naiveShare > 0.15,
      s"naive cid layout must concentrate the hot cell: max share $naiveShare")
    cents.unpersist()
    info(f"hot cell share $hotShare%.3f; naive per-task max share $naiveShare%.3f")
  }

  test("AQE skew join splits the hot cid partition on the real q139 search join; results unchanged") {
    // baseline result under default config (broadcast allowed — cents
    // are tiny, candidates joined however AQE likes)
    val expected = EmbeddingQueries.q139AnnHotCell(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    spark.catalog.clearCache()
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // toy-scale hot partitions are runs of near-identical keys — lz4
      // squeezes them under the kilobyte defaults, so floor the byte
      // thresholds (SkewGateSpec's recipe); the split mechanism is the
      // one production sizes trigger at the defaults
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // force the shuffle join: at sf0.001 AQE would broadcast one side
      // and there would be no skewed exchange to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32") {
      val e = corpus
      val cents = trained
      val ranked = EmbeddingQueries.ivfRanked(e, cents, nprobe = 2)
      val build = ranked.filter(col("rn") === 1).select(col("cid"),
        col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
      val probes = ranked.select(col("cid"),
        col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      val j = probes.join(build, Seq("cid"))
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("sim",
          graft.expr.NativeVecFns.dot(spark, col("a_emb"), col("b_emb"))
            / (col("a_nrm") * col("b_nrm")))
        .groupBy("a_id")
        .agg(graft.expr.TopKAgg.topKByScore(spark, col("sim"), col("b_id"), 3).as("top"))
        .select(col("a_id").as("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("vec_id"), col("t.id").as("neighbor_id"),
          (col("pos") + 1).as("rank"), round(col("t.score"), 4).as("cosine_sim"))
      // AQE finalizes at execution — materialize, then read the final plan
      val got = j.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      assert(got == expected, "skew-split search must not change results")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"AQE must mark the skewed cid join in the final plan:\n${plan.take(4000)}")
      cents.unpersist()
    }
  }
}
