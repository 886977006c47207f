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
