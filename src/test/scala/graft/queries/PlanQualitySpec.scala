package graft.queries

import graft.SparkSpec

/** Physical-plan assertions — the scale properties the 100 TB design
  * depends on must be visible in the executed plan, not just intended:
  * dimension joins broadcast, filters and projections reach the parquet
  * scan, hot expressions stay inside whole-stage codegen, and nothing
  * degenerates into a cartesian product. A regression here is a silent
  * 100× at scale even when results stay correct. */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q2 star joins broadcast the dimension tables") {
    val p = plan("q2_join_agg")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q1 scan prunes to the referenced columns only") {
    val p = plan("q1_agg")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    assert(!read.contains("l_partkey") && !read.contains("l_shipdate"),
      s"unused columns must not be read: $read")
  }

  test("q5 pushes the orders predicate into the parquet scan") {
    val p = plan("q5_anti_join")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(o_totalprice"),
      "o_totalprice filter must reach the scan")
  }

  test("aggregations split partial/final (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "expect partial aggregation before the shuffle")
  }

  test("native expressions run inside whole-stage codegen") {
    // AQE finalizes codegen wrapping at execution time — run first
    val df = graft.SparkEntry.queries("q28_fingerprint")(spark, sfDir)
    df.collect()
    val p28 = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen stage n
    assert(p28.contains("*(1) Project"), s"expected codegen'd projection:\n$p28")
    assert(p28.contains("poly_hash") && p28.contains("min_gram_hash"))
    // q31 moved to the dense mapPartitions tier; q32 carries the
    // relational vec_dot / native-bucket plan shape
    val p32 = plan("q32_ann_lsh")
    assert(p32.contains("vec_dot") && p32.contains("vec_rhp_bucket"))
  }

  test("windows are keyed (no single-partition window in the raw-data path)") {
    val p = plan("q8_window_lead")
    // every Window node must carry a partition spec with user_id
    p.linesIterator.filter(_.trim.startsWith("Window ")).foreach { l =>
      assert(l.contains("user_id"), s"unkeyed window: $l")
    }
  }

  test("LSH candidate join is an equi-join on the band key, not a cross join") {
    val p = plan("q30_minhash_lsh")
    assert(!p.contains("CartesianProduct"), "band join must hash-partition on the key")
  }

  test("q53 blocking is a bucket equi-join; star-closure rounds gated on the sf0.1 graph") {
    val sf01 = "/root/testdata/sf0.1"
    val emb = graft.core.Tables.embeddings(spark, sf01)
    val pairs = EmbeddingQueries.embedNearDupPairs(emb, nbits = 8, threshold = 0.28)
    val pp = pairs.queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct") && !pp.contains("BroadcastNestedLoopJoin"),
      s"candidate pairs must come from the bucket equi-join only:\n$pp")
    assert(pp.contains("vec_rhp_bucket"), "blocking must use the native bucket kernel")
    // Round gate: the sf0.1 similarity graph is chain-like (diameter 11,
    // the reason q53 runs star rather than propagation); star's O(log²)
    // bound lands it in a handful of rounds. A convergence-detection or
    // contraction regression would multiply q53's cost yet hide inside
    // sweep noise — this pin makes it a hard failure instead.
    import org.apache.spark.sql.functions.col
    val verts = emb.select(col("vec_id").as("id"))
    val (comp, rounds) =
      graft.ml.ConnectedComponents.componentsStarCounted(verts, pairs)
    info(s"star closure rounds on the sf0.1 graph: $rounds")
    assert(rounds <= 7, s"star closure took $rounds rounds (expected ≤7 — regression?)")
    assert(comp.count() == verts.count(), "closure must label every vertex exactly once")
  }

  test("q90 media near-dup: candidate pairs are bucket-keyed only, L1 kernel native") {
    val feats = graft.multimodal.MediaOps.imageFeatures(
      graft.multimodal.MediaOps.syntheticMedia(spark, 200))
    val b = graft.multimodal.MediaOps.featureBuckets(feats, 8)
    import org.apache.spark.sql.functions.col
    val pairs = b.select(col("bucket"), col("media_id").as("a_id"), col("features").as("a_f"))
      .join(b.select(col("bucket"), col("media_id").as("b_id"), col("features").as("b_f")), Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .filter(graft.expr.NativeVecFns.l1Dist(spark, col("a_f"), col("b_f")) < 0.004)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"media near-dup pairs must be bucket-keyed:\n$p")
    assert(p.contains("vec_l1") && p.contains("vec_rhp_bucket"),
      "blocking and metric must use the native kernels")
  }

  test("q91/q92: new-query plans stay keyed (no cartesian anywhere)") {
    // q91: PageRank over the maintained edge store — statically unrolled
    // keyed rounds, edge scan from parquet
    val p91 = plan("q91_incremental_pagerank")
    assert(!p91.contains("CartesianProduct"), s"q91 must stay keyed:\n$p91")
    // q92: sharded recall — ground truth broadcasts the probe sample,
    // LSH candidates join on (shard, bucket)
    val df92 = graft.SparkEntry.queries("q92_ann_recall_sharded")(spark, sfDir)
    val p92 = df92.queryExecution.executedPlan.toString
    assert(!p92.contains("CartesianProduct"), s"q92 must stay keyed:\n$p92")
    assert(p92.contains("BroadcastHashJoin") || p92.contains("BroadcastNestedLoopJoin"),
      "q92 exact side must broadcast the probe sample")
  }

  test("q120 production recall eval (probeModFor rate): same plan contract as q92") {
    val df = graft.SparkEntry.queries("q120_recall_scaled")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"q120 must stay keyed:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "q120 exact side must broadcast the probe sample")
  }

  test("q51 unioned sensor merge aggregates in a single shuffle (no join chain)") {
    val df = graft.SparkEntry.queries("q51_sensor_merge_unioned")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "union-merge must not contain joins")
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    // one hash exchange for groupBy(Timestamp) (+ none per input file)
    assert(exchanges <= 2, s"expected a single-shuffle merge, saw $exchanges exchanges:\n$p")
  }

  test("bucketed fact join runs without an Exchange on either side") {
    // disable broadcast so the co-location (not a broadcast) carries the
    // join — at 100 TB neither fact side is broadcastable
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      Seq(s"lineitem_bkt$tag", s"orders_bkt$tag")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val df = graft.SparkEntry.queries("q55_bucketed_join")(spark, sfDir)
      df.collect()
      // AQE plans print "== Final Plan ==" then repeat "== Initial Plan ==";
      // judge only the final one
      val full = df.queryExecution.executedPlan.toString
      val p = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i  => full.substring(0, i)
      }
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      val joinIdx = p.indexOf("SortMergeJoin")
      // the only Exchange allowed is ABOVE the join (the groupBy); below
      // it both scans must feed the join bucket-aligned
      val below = p.substring(joinIdx)
      assert(!below.contains("Exchange"),
        s"bucketed join must not shuffle its inputs:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"scans must be bucket-aware:\n$p")
    }
  }

  test("q121 scale-bucketed fact join keeps the zero-Exchange contract") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val buckets = graft.operators.BucketedTables.bucketsFor(
        graft.core.Tables.lineitem(spark, sfDir).count())
      Seq(s"lineitem_bkt${buckets}_$tag", s"orders_bkt${buckets}_$tag")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val df = graft.SparkEntry.queries("q121_bucketed_scaled")(spark, sfDir)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val p = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i  => full.substring(0, i)
      }
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      val below = p.substring(p.indexOf("SortMergeJoin"))
      assert(!below.contains("Exchange"),
        s"derived-bucket join must not shuffle its inputs:\n$p")
    }
  }

  test("q61 decontamination: benchmark side broadcasts, corpus never self-joins") {
    val df = graft.SparkEntry.queries("q61_decontamination")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "benchmark shingles must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"corpus must not shuffle-join on shingles:\n$p")
  }

  test("q63 packing window is keyed by the source shard") {
    val p = plan("q63_pack_sequences")
    p.linesIterator.filter(_.trim.startsWith("Window ")).foreach { l =>
      assert(l.contains("source"), s"unkeyed packing window: $l")
    }
  }

  test("q64 tf-idf broadcasts the vocab-dim df side") {
    val df = graft.SparkEntry.queries("q64_tfidf")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "df join must broadcast")
    assert(p.contains("partial_count"), "tf aggregation must combine map-side")
  }

  test("q65 chunking plan has no shuffle at all") {
    val p = plan("q65_chunk_windows")
    assert(!p.contains("Exchange"), s"chunking must stay partition-local:\n$p")
  }

  test("native expressions compile under CODEGEN_ONLY (no silent interpreted fallback)") {
    // A generated-code compile error normally falls back to interpreted eval
    // silently (results stay right, the claimed codegen tier never runs).
    // CODEGEN_ONLY + fallback=false turn that into a hard failure, so a bad
    // doGenCode emit — e.g. referencing MODULE$ on a mirror class — cannot
    // ship green. Covers every query that carries a native expression.
    // one query per native-expression class: PolyHash/MinGramHash (q28),
    // SimHash32 (q29), TokenHashes/ShingleHashes/MinHashSig (q30),
    // RhpBucket/FloatVecDot (q32), FloatVecL2Sq (q33), bloom expressions
    // (q56), TokenHashes at contamination width (q61), the q72 bigram
    // pipeline, q53 + p5 as the composed consumers
    withSQLConf(
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      Seq("q28_fingerprint", "q29_simhash", "q30_minhash_lsh", "q32_ann_lsh",
        "q33_ivf_centroid", "q56_bloom_pruned_join", "q61_decontamination",
        "q72_bigram_lm", "q53_embed_neardup", "p5_media_features",
        "q90_media_neardup") // FloatVecL1
        .foreach { name =>
          val rows = graft.SparkEntry.queries(name)(spark, sfDir).collect()
          assert(rows.nonEmpty, s"$name returned no rows under CODEGEN_ONLY")
        }
    }
  }

  test("q72 LM doc-side join broadcasts the vocab-dim model") {
    val df = graft.SparkEntry.queries("q72_bigram_lm")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "scored model must broadcast to the doc side")
    assert(!p.contains("CartesianProduct"))
  }

  test("q73 PII redaction has no shuffle at all") {
    val p = plan("q73_pii_redact")
    assert(!p.contains("Exchange"), s"redaction must stay partition-local:\n$p")
  }

  test("q74 SemDeDup: centroids broadcast, pair join keyed by cluster") {
    val df = graft.SparkEntry.queries("q74_semdedup")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroids must broadcast")
    assert(!p.contains("CartesianProduct"), s"pair join must stay cluster-keyed:\n$p")
  }

  test("q119 production SemDeDup (sampled fit, kFor clusters): same plan contract as q74") {
    val df = graft.SparkEntry.queries("q119_semdedup_scaled")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroids must broadcast")
    assert(!p.contains("CartesianProduct"), s"pair join must stay cluster-keyed:\n$p")
  }

  test("ORC scans get predicate pushdown and column pruning like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("orcplan").toString
    graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").orc(dir)
    val df = spark.read.orc(dir)
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 25.0)
      .select("l_returnflag", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"),
      s"l_quantity filter must reach the ORC scan:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && !read.contains("l_extendedprice"),
      s"unused columns must not be read from ORC: $read")
  }

  test("q79 PageRank rounds are keyed joins; only 1-row constants nest-loop") {
    val p = plan("q79_pagerank")
    assert(!p.contains("CartesianProduct"),
      s"rank/edge joins must be keyed:\n$p")
    // the per-round rank×edges join must be hash-based, never nested-loop
    // (BroadcastNestedLoopJoin appears only for the broadcast one-row
    // teleport/count constants, which is the intended shape)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"expected keyed join:\n$p")
  }

  test("q80 novelty-curve window is keyed by source") {
    val p = plan("q80_novelty_curve")
    p.linesIterator.filter(_.trim.startsWith("Window ")).foreach { l =>
      assert(l.contains("source"), s"unkeyed window: $l")
    }
  }

  test("q81 BPE argmax is a TakeOrdered(1), not a global sort") {
    val p = plan("q81_bpe_merges")
    assert(p.contains("TakeOrderedAndProject"),
      s"pair argmax must be top-k, not Sort+Limit over a full shuffle:\n$p")
  }

  test("q82 DSIR ratio table broadcasts; distributions combine map-side") {
    val p = plan("q82_dsir_weights")
    assert(!p.contains("CartesianProduct"), s"no all-pairs step:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the B-row ratio table must broadcast to the (doc,bucket) side:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"bucket distributions must combine map-side:\n$p")
  }

  test("q83 triangle joins are all keyed (orientation bounds the wedge join)") {
    val p = plan("q83_triangles")
    assert(!p.contains("CartesianProduct"),
      s"wedge + closing joins must be equi-joins:\n$p")
  }

  test("q84 BM25 top-k is TakeOrdered; stats broadcast to the term side") {
    val p = plan("q84_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"idf (query-term-dim) must broadcast:\n$p")
    // the doc prefilter must sit BELOW the explode: non-matching documents
    // never pay tokenize+Generate. Plans print root-first, so the Contains
    // filter (or its parquet pushdown) must appear AFTER the Generate line.
    val lines = p.linesIterator.toSeq
    val gen = lines.indexWhere(_.contains("Generate explode"))
    val flt = lines.indexWhere(l =>
      l.contains("Contains(text") || l.contains("contains(text"))
    assert(gen >= 0 && flt > gen,
      s"text-contains prefilter must be below the Generate (gen=$gen, filter=$flt):\n$p")
  }

  test("q85 multi-probe BM25: probes broadcast, top-k window keyed by query") {
    val p = plan("q85_bm25_multiprobe")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(_.trim.startsWith("Window ")).foreach { l =>
      assert(l.contains("query_id"), s"unkeyed per-query top-k window: $l")
    }
    assert(p.contains("BroadcastHashJoin"),
      s"the probes table must broadcast onto the postings:\n$p")
  }

  test("multi-probe LSH stays a bucket equi-join (no cross join)") {
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val df = EmbeddingQueries.annLshMultiProbe(e, 64, nbits = 8, k = 3, probes = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"probe join must remain keyed:\n$p")
  }

  test("q87 BPE encode: vocab joins by word key, word stream aggregates map-side") {
    val p = plan("q87_bpe_encode")
    assert(!p.contains("CartesianProduct"),
      s"the encode path must never cross-join:\n$p")
    // the only nest-loop joins allowed are the 1-row argmax constants of
    // the two merge rounds (same contract as q79's teleport constants)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"per-doc counts must combine map-side:\n$p")
  }

  test("q89 trained-IVF ANN: centroids broadcast, search is a cid equi-join") {
    val p = plan("q89_ivf_ann")
    assert(!p.contains("CartesianProduct"), s"IVF search must never cross-join:\n$p")
    // the only nest-loop join is the k×dim centroid broadcast (k=32 rows,
    // inside the cached ranked frame)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroid table must broadcast:\n$p")
    // the rerank join itself must be keyed by cid (vec_l2_dist_sq lives
    // below the InMemoryRelation cut and may not print)
    assert(p.contains("vec_dot"),
      s"native cosine kernel must survive into the physical plan:\n$p")
    assert(p.contains("SortMergeJoin [cid") || p.contains("ShuffledHashJoin [cid")
      || p.contains("BroadcastHashJoin [cid"),
      s"IVF search must join on the cell key:\n$p")
  }

  test("q118 production IVF (sampled fit, kFor width): same plan contract as q89") {
    val p = plan("q118_ivf_scaled")
    assert(!p.contains("CartesianProduct"), s"IVF search must never cross-join:\n$p")
    // the only nest-loop join is the kFor(N)×dim centroid broadcast
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroid table must broadcast:\n$p")
    assert(p.contains("vec_dot"),
      s"native cosine kernel must survive into the physical plan:\n$p")
    assert(p.contains("SortMergeJoin [cid") || p.contains("ShuffledHashJoin [cid")
      || p.contains("BroadcastHashJoin [cid"),
      s"IVF search must join on the cell key:\n$p")
  }

  test("q99 CMS: sketch probe join broadcasts, counting combines map-side") {
    val p = plan("q99_countmin_freq")
    assert(!p.contains("CartesianProduct"), s"CMS must not cross-join:\n$p")
    // the 1024-cell sketch joins the 20-row probe frame via broadcast
    assert(p.contains("BroadcastHashJoin"),
      s"cell/probe join must broadcast, never shuffle the corpus:\n$p")
    assert(p.contains("partial_count"),
      s"cell counting must combine map-side before the d×w-bounded shuffle:\n$p")
  }

  test("q100 OLS: per-key min frame broadcasts, sufficient stats combine map-side") {
    val p = plan("q100_ols_trend")
    assert(p.contains("BroadcastHashJoin"),
      s"the user-dim d0 frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the regression path:\n$p")
    assert(p.contains("partial_sum"),
      s"sufficient statistics must combine map-side:\n$p")
  }

  test("q105 corpus diff: one keyed full-outer join, hashes pushed below it") {
    val p = plan("q105_corpus_diff")
    assert(!p.contains("CartesianProduct"))
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") || l.contains("BroadcastHashJoin"))
    assert(joins == 1, s"diff must be exactly one keyed join, got $joins:\n$p")
    assert(p.contains("FullOuter"), s"must be a full-outer join:\n$p")
  }

  test("q106 schema evolution: merged scan reads both generations columnar") {
    val df = graft.SparkEntry.queries("q106_schema_evolution")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // one scan over both generation paths; the evolved column must be in
    // the unified read schema
    assert(p.contains("o_orderpriority"), s"evolved column missing from scan:\n$p")
    assert(!p.contains("Union"), s"mergeSchema must unify in ONE scan, not a union:\n$p")
  }

  test("q109/q110: stats frames broadcast back, no shuffle join in the second pass") {
    Seq("q109_outlier_fence", "q110_zscore").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q stats frame must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q must not shuffle-join the raw rows:\n$p")
    }
  }

  test("q130 residual store search: centroids broadcast (recon join), candidates stay a cid equi-join") {
    val p = plan("q130_ivfpq_res_incremental")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), "centroid recon join must broadcast")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "candidate join must be an equi-join")
  }

  test("q132 filtered ANN: the metadata predicate is a semi-join on the candidate side") {
    val p = plan("q132_ivfpq_filtered")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftSemi"), s"allowed-ids filter must be a left-semi join:\n${p.take(2000)}")
  }

  test("q133 production config: tombstone anti-join and metadata semi-join both present, no cartesian") {
    val p = plan("q133_ivfpq_production")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftSemi"), "metadata filter must be a left-semi join")
    assert(p.contains("LeftAnti"), "tombstones must be a left-anti join")
    assert(p.contains("BroadcastHashJoin"), "centroid recon join must broadcast")
  }

  test("q88 ANN recall: ground truth is the labeled broadcast pass, approx side stays keyed") {
    val p = plan("q88_ann_recall")
    // exact side: probe sample broadcasts against the corpus stream — a
    // BroadcastNestedLoopJoin is the DOCUMENTED shape here (sample-bounded
    // all-pairs is what ground truth costs); the approx side must remain
    // q32's bucket equi-join, so exactly one nest-loop join may appear
    val nlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nlj == 1, s"expected exactly the ground-truth nest-loop join, got $nlj:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast cross join:\n$p")
  }

  test("r14 spill fixes hold: no vec_id window sort in the ANN centroid paths, TopKAgg stays hash-mode") {
    // Mechanism 2 regression gate: the coarse assign / probe ranking must
    // plan as aggregates (map-side combine of the N×k cross-join stream),
    // never as a row_number window that exchanges and sorts it — measured
    // at sf10 as 18.45 GB of sort spill per pass before the r14 rewrite.
    // q89 exercises ivfRanked+assign; q74 the SemDeDup assign; q33 the
    // label-centroid argmin.
    for (name <- Seq("q89_ivf_ann", "q74_semdedup", "q33_ivf_centroid")) {
      val p = plan(name)
      assert(!p.contains("Window"),
        s"$name must not plan a window over the centroid-distance stream:\n$p")
      assert(p.contains("ObjectHashAggregate") && p.contains("top_k_by_score"),
        s"$name: the argmin/probe ranking must be the TopKAgg aggregate:\n$p")
    }
    // Mechanism 1 regression gate: the session must carry the raised
    // ObjectHashAggregate fallback threshold — at Spark's default 128 every
    // >128-group task silently externally-sorts its whole input instead.
    // honor the SPARK_GRAFT_OHA_FALLBACK A/B override Sessions.builder
    // applies — otherwise this assertion fails spuriously in any
    // environment where that variable is exported
    val expected = sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK",
      graft.core.Sessions.ObjectAggFallbackKeys.toString)
    val th = spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    assert(th.toInt == expected.toInt,
      s"fallback threshold must be the engine default (or its env override), got $th")
  }

  test("mining wave: every candidate join is keyed — no cartesian/nested-loop anywhere") {
    // q143 is kernel-based (no join until the bounded margin frames);
    // q144/q145/q147 must stay equi-joins on their blocking keys
    for (name <- Seq("q143_margin_mining", "q144_fuzzy_join",
        "q145_containment", "q147_margin_mining_lsh")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name plans an unkeyed join")
    }
    // the margin rankings ride the hash-mode TopKAgg (r14 aggregate-form
    // discipline), not windows
    for (name <- Seq("q143_margin_mining", "q147_margin_mining_lsh")) {
      val p = plan(name)
      assert(!p.contains("Window"), s"$name must rank via TopKAgg, not a window")
      assert(p.contains("TopKByScore") || p.contains("top_k_by_score"),
        s"$name must contain the TopKAgg ranking")
    }
  }
}
