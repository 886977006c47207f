package graft.queries

import graft.SparkSpec
import graft.operators.FrequentItems
import org.apache.spark.sql.functions._

/** Property checks for the corpus-curation wave (q61-q64); their
  * engine-vs-engine correctness is driver-proven against DuckDB. */
class CurationQueriesSpec extends SparkSpec {

  import spark.implicits._

  test("q61: benchmark docs excluded; contaminated iff sharing an 8-gram; exact dups flagged") {
    val out = CurationQueries.q61Decontamination(spark, sfDir).cache()
    // output contains exactly the non-benchmark slice
    assert(out.filter(col("doc_id") % 100 < 2).count() == 0)
    // is_contaminated consistent with n_hits, and n_hits bounded by n_grams
    assert(out.filter(col("is_contaminated") =!= (col("n_hits") > 0)).count() == 0)
    assert(out.filter(col("n_hits") > col("n_grams")).count() == 0)
    // ground truth: an exact copy of a benchmark doc (with ≥ 8 tokens)
    // MUST be flagged — check via text equality against the bench slice
    val d = graft.core.Tables.documents(spark, sfDir)
    val bench = d.filter(col("doc_id") % 100 < 2)
      .filter(size(graft.functions.TextFns.tokens(col("text"))) >= 8)
      .select(col("text")).distinct()
    val exactCopies = d.filter(col("doc_id") % 100 >= 2)
      .join(bench, Seq("text")).select("doc_id")
    val missed = exactCopies.join(out.filter(!col("is_contaminated")), Seq("doc_id")).count()
    assert(missed == 0, "an exact benchmark copy escaped decontamination")
    out.unpersist()
  }

  test("q62 exact vs FrequentItems SpaceSaving: big capacity = exact, small capacity = bounded") {
    val exact = CurationQueries.q62HeavyHitters(spark, sfDir)
      .select("token", "freq").as[(String, Long)].collect().toSeq
    val items = graft.core.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
    // capacity far above vocab: no evictions → exact counts, same top-20
    val bigCap = FrequentItems.spaceSavingTopK(items, "token", 20, 100000)
    assert(bigCap.map { case (t, c, _) => (t, c) } == exact)
    assert(bigCap.forall(_._3 == 0L), "no evictions → zero error terms")
    // small capacity: SpaceSaving guarantees est ≥ true and est − err ≤ true
    val n = items.count()
    val cap = 64
    val small = FrequentItems.spaceSavingTopK(items, "token", 20, cap)
    val trueCounts = exact.toMap
    for ((tok, est, err) <- small; t <- trueCounts.get(tok)) {
      assert(est >= t, s"$tok: estimate $est below true $t")
      assert(est - err <= t, s"$tok: guaranteed count ${est - err} above true $t")
    }
    // recall: every token with true freq > N/capacity must be present
    val mustHave = exact.filter(_._2 > n / cap).map(_._1).toSet
    assert(mustHave.subsetOf(small.map(_._1).toSet),
      s"missing guaranteed heavy hitters: ${mustHave -- small.map(_._1).toSet}")
  }

  test("SpaceSaving merge: item evicted on one partition still satisfies est ≥ true") {
    import graft.operators.FrequentItems.SpaceSaving
    // partition A: x kept with count 3
    val a = new SpaceSaving(2)
    a.offer("x"); a.offer("x"); a.offer("x"); a.offer("y")
    // partition B: x seen twice, then evicted by a flood of other items
    val b = new SpaceSaving(2)
    b.offer("x"); b.offer("x")
    for (_ <- 1 to 5) { b.offer("u"); b.offer("v") }
    val m = a.merge(b)
    val trueX = 5L // 3 in A + 2 in B
    val (estX, errX) = m.table.get("x")
    assert(estX >= trueX, s"merged estimate $estX must cover true count $trueX")
    assert(estX - errX <= trueX, s"guaranteed count ${estX - errX} must not exceed true $trueX")
    // merge is symmetric in its guarantees
    val m2 = b.merge(a)
    val (estX2, errX2) = m2.table.get("x")
    assert(estX2 >= trueX && estX2 - errX2 <= trueX)
  }

  test("property: SpaceSaving guarantees hold on random streams, splits, and capacities") {
    import graft.operators.FrequentItems.SpaceSaving
    import org.scalacheck.{Gen, rng}
    def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      Iterator.iterate(rng.Seed(seed))(_.next).take(n)
        .flatMap(s => g.apply(Gen.Parameters.default, s)).toSeq
    // zipfish streams: small alphabet with skewed weights so evictions
    // and cross-partition splits of heavy items both actually occur
    val streamGen = for {
      n <- Gen.chooseNum(50, 400)
      items <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
        2 -> Gen.oneOf("c", "d", "e"), 1 -> Gen.chooseNum(0, 40).map("t" + _)))
      cap <- Gen.chooseNum(2, 12)
      cut <- Gen.chooseNum(0, n)
    } yield (items, cap, cut)
    sample(streamGen, 25, 42L).foreach { case (items, cap, cut) =>
      val (p1, p2) = items.splitAt(cut)
      val a = new SpaceSaving(cap); p1.foreach(a.offer(_))
      val b = new SpaceSaving(cap); p2.foreach(b.offer(_))
      val merged = a.merge(b)
      val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = items.size.toLong
      import scala.jdk.CollectionConverters._
      val table = merged.table.asScala.toMap
      for ((tok, (est, err)) <- table; t <- trueCounts.get(tok)) {
        assert(est >= t, s"cap=$cap cut=$cut $tok: est $est < true $t")
        assert(est - err <= t, s"cap=$cap cut=$cut $tok: guaranteed ${est - err} > true $t")
      }
      // recall: every item with true freq > n/cap must survive the merge
      for ((tok, t) <- trueCounts if t > n / cap)
        assert(table.contains(tok), s"cap=$cap cut=$cut heavy item $tok (freq $t) evicted")
    }
  }

  test("spaceSavingTopK tree merge: bounds hold across a 1000-partition input") {
    import spark.implicits._
    // a clear head item plus a long tail; 1000 partitions forces the
    // treeAggregate path through multiple merge levels (most partitions
    // contribute an empty or tiny summary — the hostile case for merge,
    // since absent items are credited each summary's minimum estimate)
    val rows = Seq.fill(5000)("hot") ++ (1 to 200).flatMap(i => Seq.fill(i)(s"t$i"))
    val items = spark.createDataset(rows).repartition(1000).toDF("token")
    val cap = 32
    val out = FrequentItems.spaceSavingTopK(items, "token", 20, cap)
    val trueCounts = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = rows.size.toLong
    for ((tok, est, err) <- out; t <- trueCounts.get(tok)) {
      assert(est >= t, s"$tok: est $est < true $t")
      assert(est - err <= t, s"$tok: guaranteed ${est - err} > true $t")
    }
    // recall: every item with true freq > n/cap must survive to the top-k
    val mustHave = trueCounts.filter { case (_, t) => t > n / cap }.keySet
    assert(mustHave.subsetOf(out.map(_._1).toSet),
      s"missing guaranteed heavy hitters: ${mustHave -- out.map(_._1).toSet}")
  }

  test("q72: predictable phrasing outscores token salad (fluency ordering)") {
    import spark.implicits._
    // doc 1 reuses the same bigrams over and over (a high-probability
    // chain under the corpus-trained model); doc 2 is all unique tokens,
    // so every one of its bigrams is a singleton
    val d = Seq(
      (1L, ("the cat sat on the mat " * 8).trim),
      (2L, (1 to 48).map(i => s"tok$i").mkString(" "))
    ).toDF("doc_id", "text")
    val scores = CurationQueries.bigramLmScores(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L),
      s"repetitive doc must outscore salad: ${scores(1L)} vs ${scores(2L)}")
  }

  test("q63: bins respect the budget invariant and offsets are consistent") {
    val out = CurationQueries.q63PackSequences(spark, sfDir).cache()
    // offset_in_bin ∈ [0, 2048); bin_id non-decreasing in doc_id per source
    assert(out.filter(col("offset_in_bin") < 0 || col("offset_in_bin") >= 2048).count() == 0)
    val monotone = out
      .withColumn("prev_bin", lag("bin_id", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("doc_id")))
      .filter(col("prev_bin").isNotNull && col("bin_id") < col("prev_bin"))
    assert(monotone.count() == 0)
    // reconstruction: bin_id * 2048 + offset_in_bin = running sum of prior tokens
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bad = out
      .withColumn("expect_start", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("bin_id") * 2048 + col("offset_in_bin") =!= col("expect_start"))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("q65: chunks tile each doc with stride 32, last chunk short, hashes consistent") {
    val out = CurationQueries.q65ChunkWindows(spark, sfDir).cache()
    // start offsets are exactly 0, 32, 64, ... per doc with no gaps
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("chunk_idx")
    val badStride = out.withColumn("prev", lag("start_tok", 1).over(w))
      .filter(col("prev").isNotNull && col("start_tok") - col("prev") =!= 32)
    assert(badStride.count() == 0)
    // every chunk except possibly the last is exactly 64 tokens
    val maxIdx = out.groupBy("doc_id").agg(max("chunk_idx").as("mx"))
    val shortNonLast = out.join(maxIdx, Seq("doc_id"))
      .filter(col("chunk_idx") < col("mx") && col("chunk_len") =!= 64)
    assert(shortNonLast.count() == 0)
    // chunk coverage: last chunk reaches the end of the doc
    val uncovered = out.join(maxIdx, Seq("doc_id"))
      .filter(col("chunk_idx") === col("mx"))
      .filter(col("start_tok") + col("chunk_len") =!= col("n_tokens"))
      // short docs (≤64 tokens) are one full-doc chunk; longer docs tile to the end
      .filter(!(col("n_tokens") <= 64 && col("chunk_len") === col("n_tokens")))
    assert(uncovered.count() == 0)
    out.unpersist()
  }

  test("q66: per-source quota = isqrt(count); exactly quota docs kept per source") {
    val out = CurationQueries.q66MixtureSample(spark, sfDir).cache()
    val bad = out.groupBy("source", "n_total", "quota")
      .agg(sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_kept"))
      .filter(col("n_kept") =!= col("quota")
        || col("quota") * col("quota") > col("n_total")
        || (col("quota") + 1) * (col("quota") + 1) <= col("n_total"))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("q67: rep_ratio bounded in [0,1); a looped doc scores higher than a diverse one") {
    import spark.implicits._
    val out = CurationQueries.q67RepetitionScore(spark, sfDir)
    assert(out.filter(col("rep_ratio") < 0 || col("rep_ratio") >= 1).count() == 0)
    // synthetic contrast: same op over a looped text vs an all-distinct text
    val probe = Seq(
      (1L, Seq.fill(20)("spam is spam").mkString(" ")),     // heavy repetition
      (2L, (1 to 60).map(i => s"tok$i").mkString(" "))       // all distinct
    ).toDF("doc_id", "text")
    // route through the same expressions by writing a temp table? simpler:
    // replicate the column pipeline inline via the public helpers
    val scored = probe
      .withColumn("th", graft.expr.NativeTextFns.tokenHashes(spark, col("text")))
      .withColumn("n_shingles", greatest(size(col("th")) - 2, lit(0)).cast("long"))
      .withColumn("n_distinct",
        size(graft.expr.NativeTextFns.shingleHashes(spark, col("th"), 3)).cast("long"))
      .withColumn("rep", (col("n_shingles") - col("n_distinct")).cast("double") / col("n_shingles"))
      .select("doc_id", "rep").as[(Long, Double)].collect().toMap
    assert(scored(1L) > 0.8 && scored(2L) == 0.0)
  }

  test("q68: exact doc copies share all windows; pair counts bounded by window counts") {
    val out = CurationQueries.q68SubstringDedup(spark, sfDir).cache()
    // every emitted pair shares at least one window and doc_a < doc_b
    assert(out.filter(col("n_shared_windows") < 1 || col("doc_a") >= col("doc_b")).count() == 0)
    // exact text copies (≥16 tokens) must appear as substring-linked pairs
    val d = graft.core.Tables.documents(spark, sfDir)
      .filter(size(graft.functions.TextFns.tokens(col("text"))) >= 16)
    val copyPairs = d.as("x").join(d.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val missed = copyPairs.join(out, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed == 0, s"$missed exact-copy pairs not substring-linked")
    out.unpersist()
  }

  test("q70: report totals reconcile with the underlying signal queries") {
    val rep = CurationQueries.q70CorpusReport(spark, sfDir).cache()
    val d = graft.core.Tables.documents(spark, sfDir)
    // doc and token totals match the raw corpus
    val (nd, nt) = rep.agg(sum("n_docs"), sum("total_tokens")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).head
    assert(nd == d.count())
    val rawTokens = d.select(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0)
    assert(nt == rawTokens)
    // duplicate tally matches q23's non-canonical count
    val q23Dups = TextQueries.q23ExactDedup(spark, sfDir)
      .filter(!col("is_canonical")).count()
    assert(rep.agg(sum("n_dup_docs")).collect()(0).getLong(0) == q23Dups)
    // contamination tally matches q61's flagged count
    val q61Contam = CurationQueries.q61Decontamination(spark, sfDir)
      .filter(col("is_contaminated")).count()
    assert(rep.agg(sum("n_contaminated")).collect()(0).getLong(0) == q61Contam)
    rep.unpersist()
  }

  test("q64: ranks are 1..≤3 per doc, tfidf ordering matches rank, df consistent") {
    val out = CurationQueries.q64TfIdf(spark, sfDir).cache()
    assert(out.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    // within a doc, higher rank never has strictly larger tfidf
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("rank")
    val inv = out.withColumn("prev", lag("tfidf", 1).over(w))
      .filter(col("prev").isNotNull && col("tfidf") > col("prev"))
    assert(inv.count() == 0)
    // df of a token is the same wherever it appears
    assert(out.groupBy("token").agg(countDistinct("df").as("k")).filter(col("k") > 1).count() == 0)
    out.unpersist()
  }
}
