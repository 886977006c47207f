package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Scale-up smoke: run the heaviest operators on a 10×-replicated events
  * table (≈100k rows from sf0.001×... replicated with shifted keys so
  * group cardinality ALSO grows 10×) and assert the plans keep their
  * scale-critical shapes and complete. This is the local stand-in for
  * "would this survive a 100× scale-up": partition counts grow, per-key
  * state does not. */
class ScaleSmokeSpec extends SparkSpec {

  /** events ×10 with disjoint user/event ids per replica. */
  private def bigEvents = {
    val e = Tables.events(spark, sfDir)
    val replicas = (0 until 10).map { r =>
      e.withColumn("user_id", col("user_id") + lit(r * 1000000L))
        .withColumn("event_id", col("event_id") + lit(r * 100000000L))
    }
    replicas.reduce(_ unionByName _)
  }

  test("electricity chain at 10x: completes, windows stay keyed, output scales") {
    val base = PipelineQueries.q34ElectricityE2e(spark, sfDir)
    val baseBuckets = base.count()

    // same chain over the replicated frame
    val ev = bigEvents
    ev.createOrReplaceTempView("events_x10")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val deltas = ev
      .withColumn("vc", round(col("value") * 100).cast("long"))
      .withColumn("next_ts", lead("ts", 1).over(w))
      .withColumn("delta_c", lead("vc", 1).over(w) - col("vc"))
      .filter(col("next_ts") >= col("ts") + expr("INTERVAL 1 MINUTE")
        && col("next_ts") <= col("ts") + expr("INTERVAL 6 HOURS"))
    val grid = deltas.select(col("user_id"),
      explode(sequence(col("ts") + expr("INTERVAL 1 MINUTE"), col("next_ts"),
        expr("INTERVAL 1 MINUTE"))).as("m"))
    val n = grid.count()
    assert(n > 0)
    // plan shape: the window must remain partitioned by user_id
    val plan = deltas.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.trim.startsWith("Window ")).foreach { l =>
      assert(l.contains("user_id"), s"unkeyed window at scale: $l")
    }
    info(s"10x grid rows: $n (base buckets $baseBuckets)")
  }

  test("exact dedup at 10x stays a single hash-partitioned window pass") {
    val d = Tables.documents(spark, sfDir)
    val big = (0 until 10).map(r => d.withColumn("doc_id", col("doc_id") + lit(r * 1000000L)))
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("text_hash")
    val out = big
      .withColumn("text_hash", sha2(lower(trim(col("text"))), 256))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("canonical_id", min("doc_id").over(w))
      .filter(col("doc_id") === col("canonical_id"))
    // every canonical row survives exactly once per distinct text
    assert(out.count() == big.select(sha2(lower(trim(col("text"))), 256)).distinct().count())
  }

  test("near-dup closure at 10x: components replicate linearly, iteration tracks edges not corpus") {
    import spark.implicits._
    // a fixed cluster pattern (chain of 3, pair, chain of 4) replicated
    // 10× with disjoint ids over a mostly-isolated 10k-vertex corpus
    val pattern = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
    val edges = (0 until 10)
      .flatMap(r => pattern.map { case (a, b) => (a + r * 1000L, b + r * 1000L) })
      .toDF("src", "dst")
    val verts = spark.range(0, 10000).select(col("id"))
    val out = graft.ml.ConnectedComponents.components(verts, edges)
    assert(out.count() == 10000, "every vertex keeps exactly one label")
    val nonTrivial = out.groupBy("component").count().filter(col("count") > 1)
    assert(nonTrivial.count() == 30, "3 clusters × 10 replicas")
    // canonical = min id of each cluster
    val mins = nonTrivial.select("component").collect().map(_.getLong(0)).toSet
    assert(mins == (0 until 10).flatMap(r => Seq(1L, 10L, 20L).map(_ + r * 1000L)).toSet)
  }

  test("bigram LM at 10x: per-doc scores are replica-invariant, model side stays broadcast") {
    // replicating the corpus with shifted doc_ids multiplies every bigram
    // and prefix count by 10, so each score s = ⌊10000·c₂/(c₁+4)⌋ only
    // drifts by the smoothing term — the corpus-model design scales: the
    // model tables stay vocab-dim while docs grow 10×
    val d = Tables.documents(spark, sfDir)
    val big = (0 until 10).map(r => d.withColumn("doc_id", col("doc_id") + lit(r * 1000000L)))
      .reduce(_ unionByName _)
    val out = CurationQueries.bigramLmScores(spark, big)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "scored model must broadcast at 10x")
    assert(p.contains("partial_count"), "model counts must combine map-side")
    // replica 0's docs score (nearly) the same as in the base corpus:
    // counts scale 10× so c₂/(c₁+4) ≈ c₂/c₁ within the smoothing drift
    val base = CurationQueries.bigramLmScores(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val scaled = out.filter(col("doc_id") < 1000000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(base.keySet == scaled.keySet)
    val maxDrift = base.keys.map(k => math.abs(base(k) - scaled(k))).max
    assert(maxDrift < 500.0, s"scores must be replica-stable, max drift $maxDrift bps")
  }

  test("decontamination at 10x: hit counts replicate exactly, benchmark side stays broadcast") {
    // replicate candidates 10× with disjoint ids that keep doc_id%100
    // (so the benchmark slice stays the SAME docs); hits must scale ×10
    val base = CurationQueries.q61Decontamination(spark, sfDir)
    val baseHits = base.agg(sum("n_hits")).collect()(0).getLong(0)
    val baseContam = base.filter(col("is_contaminated")).count()
    val d = Tables.documents(spark, sfDir)
    val big = (0 until 10).map(r => d.withColumn("doc_id", col("doc_id") + lit(r * 1000000L)))
      .reduce(_ unionByName _)
    big.createOrReplaceTempView("documents_x10")
    // same pipeline inline over the replicated frame (replica ids keep
    // doc_id % 100, so each replica contributes an identical slice)
    val sh = big
      .withColumn("th", graft.expr.NativeTextFns.tokenHashes(spark, col("text")))
      .select(col("doc_id"), graft.expr.NativeTextFns.shingleHashes(spark, col("th"), 8).as("sh"))
    val bench = sh.filter(col("doc_id") % 100 < 2).select(explode(col("sh")).as("g")).distinct()
    val cand = sh.filter(col("doc_id") % 100 >= 2)
    val hits = cand.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(bench), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    val contam = hits.filter(col("n_hits") > 0).count()
    assert(contam == baseContam * 10, s"contaminated docs must replicate ×10: $contam vs $baseContam")
    assert(hits.agg(sum("n_hits")).collect()(0).getLong(0) >= baseHits * 10,
      "benchmark set only grows with replicas → hits can only grow")
  }

  test("sequence packing at 10x: per-shard bins grow, bins never interleave shards") {
    val d = Tables.documents(spark, sfDir)
    val big = (0 until 10).map(r =>
        d.withColumn("doc_id", col("doc_id") + lit(r * 1000000L))
          .withColumn("source", concat(col("source"), lit(s"_r$r"))))
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packed = big
      .select(col("source"), col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("bin_id", floor(col("start_off") / 2048L))
    // 10× the shards, same per-shard bin count as the base source
    val binsPerShard = packed.groupBy("source").agg(max("bin_id").as("mx"))
    assert(binsPerShard.count() == 200, "20 sources × 10 replicas")
    // every (source, bin) holds ≤ 2048 start offsets by construction
    val plan = packed.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.trim.startsWith("Window ")).foreach { l =>
      assert(l.contains("source"), s"packing window lost its shard key at scale: $l")
    }
  }

  test("PageRank at 10x: replica ranks are bit-equal when scale tracks n") {
    import spark.implicits._
    // fixed-point arithmetic makes this EXACT: with the unit scaled by the
    // replica factor, every per-node quantity satisfies
    // floor(10S / 10n) = floor(S / n), so replica-0 ranks in the 10×
    // graph equal the base-graph ranks bit-for-bit — the property that a
    // 100 TB corpus re-shard cannot shift curation decisions
    val pattern = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (20L, 23L))
    val sym = pattern ++ pattern.map(_.swap)
    val s = 1000000000000L
    val base = graft.ml.PageRank.ranks(sym.toDF("src", "dst"), 5, s)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val big = (0 until 10)
      .flatMap(r => sym.map { case (a, b) => (a + r * 1000L, b + r * 1000L) })
      .toDF("src", "dst")
    val bigRanks = graft.ml.PageRank.ranks(big, 5, 10 * s)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bigRanks.size == base.size * 10)
    for (r <- 0 until 10; (node, v) <- base)
      assert(bigRanks(node + r * 1000L) == v,
        s"replica $r node $node rank must be bit-equal to base")
  }

  test("directed PageRank at 10x: dangling redistribution is replica-exact too") {
    import spark.implicits._
    // 1→2→3 plus 1→3: node 1 source-only, node 3 dangling — the dangling
    // sum D scales ×10 with n, so floor(10D/10n) = floor(D/n) round by round
    val pattern = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val s = 1000000000000L
    val base = graft.ml.PageRank.ranksDirected(pattern.toDF("src", "dst"), 5, s)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val big = (0 until 10)
      .flatMap(r => pattern.map { case (a, b) => (a + r * 1000L, b + r * 1000L) })
      .toDF("src", "dst")
    val bigRanks = graft.ml.PageRank.ranksDirected(big, 5, 10 * s)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (r <- 0 until 10; (node, v) <- base)
      assert(bigRanks(node + r * 1000L) == v)
  }

  test("triangles at 10x: clustering coefficients replicate exactly, counts scale linearly") {
    import spark.implicits._
    // triangle + pendant (1-2-3 closed, 4 hangs off 1), plus a square
    // (no triangles) — clustering is graph-local, so replicas are exact
    val pattern = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L),
      (20L, 21L), (21L, 22L), (22L, 23L), (20L, 23L))
    val base = GraphQueries.trianglesOf(pattern.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val big = (0 until 10)
      .flatMap(r => pattern.map { case (a, b) => (a + r * 1000L, b + r * 1000L) })
      .toDF("doc_a", "doc_b")
    val out = GraphQueries.trianglesOf(big)
    val bigRows = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(bigRows.size == base.size * 10)
    for (r <- 0 until 10; (node, v) <- base)
      assert(bigRows(node + r * 1000L) == v,
        s"replica $r node $node clustering must replicate exactly")
    // total triangles scale linearly: 1 per replica
    assert(bigRows.values.map(_._2).sum == base.values.map(_._2).sum * 10)
    // plan: all joins stay keyed at scale
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"wedge joins must stay keyed:\n$p")
  }

  test("trained-IVF probe assignments are replica-exact at 10x") {
    // 10 copies of the embedding set under disjoint id ranges: the
    // quantizer trains on the union (k lowest ids = replica 0's seeds,
    // so init is identical; cluster means over 10 identical copies equal
    // the base means up to summation wobble, 9 orders below the measured
    // assignment margins) — every replica's probe cells must equal the
    // base run's. This is the q89 property that re-sharding the corpus
    // cannot move vectors across inverted lists.
    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val off = 1000000000L
    val big = (0 until 10)
      .map(r => base.withColumn("vec_id", col("vec_id") + lit(r * off)))
      .reduce(_ unionByName _)
    def probeCells(vecs: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Seq[Int]] = {
      val (cents, _) = graft.ml.KMeans.fit(vecs, k, 2)
      val out = EmbeddingQueries.ivfRanked(vecs, cents, nprobe = 2)
        .select("vec_id", "cid", "rn").collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) => id -> rows.sortBy(_.getInt(2)).map(_.getInt(1)).toSeq }
      cents.unpersist()
      out
    }
    val baseCells = probeCells(base, 8)
    val bigCells = probeCells(big, 8)
    assert(bigCells.size == baseCells.size * 10)
    for (r <- 0 until 10; (id, cells) <- baseCells)
      assert(bigCells(id + r * off) == cells,
        s"replica $r vector $id probe cells ${bigCells(id + r * off)} != base $cells")
  }

  test("sharded ANN recall is replica-exact at 10x") {
    // the eval-harness twin of the probe-cell property: 10 identical
    // shards, recall keyed by shard end-to-end — every shard must
    // reproduce the single-shard recall report bit-for-bit (integer
    // counts; the shard key keeps ground truth and candidates from
    // crossing shard boundaries)
    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val one = base.select(lit(0).as("shard"), col("vec_id"), col("embedding"))
    def collectMap(df: org.apache.spark.sql.DataFrame) = df
      .select("shard", "vec_id", "n_exact", "n_hit", "recall_bp").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val baseOut = collectMap(EmbeddingQueries.annRecallSharded(one))
    val big = (0 until 10)
      .map(r => base.select(lit(r).as("shard"), col("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val bigDf = EmbeddingQueries.annRecallSharded(big)
    val bigOut = collectMap(bigDf)
    assert(bigOut.size == baseOut.size * 10)
    for (r <- 0 until 10; ((_, id), v) <- baseOut)
      assert(bigOut((r, id)) == v, s"shard $r vector $id recall must equal base")
    // scale shape: candidates stay (shard, bucket)-keyed — no cartesian
    val p = bigDf.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"sharded recall must stay keyed:\n$p")
  }

  test("top-k aggregate holds per-group state constant as groups scale 10x") {
    val e = bigEvents
    val agg = e.groupBy("user_id")
      .agg(graft.expr.TopKAgg.topKByScore(spark, col("value"), col("event_id"), 3).as("top"))
    val rows = agg.select(col("user_id"), size(col("top")).as("k")).collect()
    assert(rows.forall(_.getInt(1) <= 3))
    assert(rows.length == e.select("user_id").distinct().count().toInt)
  }
}
