package graft.queries

import graft.SparkSpec
import graft.core.Tables
import graft.functions.VecFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property checks for the pair-mining wave (q143-q145); engine-vs-engine
  * correctness is driver-proven against DuckDB. */
class MiningQueriesSpec extends SparkSpec {

  test("q143: margin mining matches a relational brute-force twin exactly") {
    val out = MiningQueries.q143MarginMining(spark, sfDir).cache()
    assert(out.count() > 0)
    // corpus split respected: sources even, targets odd
    assert(out.filter(col("src_id") % 2 =!= 0 || col("tgt_id") % 2 =!= 1).count() == 0)
    // one best pair per source, margin gated
    assert(out.groupBy("src_id").count().filter(col("count") > 1).count() == 0)
    assert(out.filter(col("margin") < 1.0).count() == 0)

    // brute-force twin: full cross join + windows (the oracle's shape),
    // same double arithmetic, same tiebreaks
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val a = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val sims = a.crossJoin(b)
      .withColumn("sim", VecFns.cosine(col("a_emb"), col("b_emb")))
      .select("a_id", "b_id", "sim")
    val k = 4
    val fw = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val bw = Window.partitionBy("b_id").orderBy(col("sim").desc, col("a_id").asc)
    val f = sims.withColumn("rn", row_number().over(fw)).filter(col("rn") <= k)
    val bk = sims.withColumn("rn", row_number().over(bw)).filter(col("rn") <= k)
    val avgF = f.groupBy("a_id").agg(avg("sim").as("avg_f"))
    val avgB = bk.groupBy("b_id").agg(avg("sim").as("avg_b"))
    val m = f.join(avgF, Seq("a_id")).join(avgB, Seq("b_id"))
      .withColumn("margin", col("sim") * 2 / (col("avg_f") + col("avg_b")))
    val mw = Window.partitionBy("a_id").orderBy(col("margin").desc, col("b_id").asc)
    val expect = m.withColumn("mr", row_number().over(mw))
      .filter(col("mr") === 1 && col("margin") >= 1.0)
      .select(col("a_id").as("src_id"), col("b_id").as("tgt_id"),
        round(col("sim"), 4).as("cosine_sim"), round(col("margin"), 4).as("margin"))

    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val exp = expect.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == exp, s"diff: got-exp=${(got -- exp).take(3)} exp-got=${(exp -- got).take(3)}")
    out.unpersist()
  }

  test("q147: LSH margin mining matches a bucket-local relational twin exactly") {
    val out = MiningQueries.q147MarginMiningLsh(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("src_id") % 2 =!= 0 || col("tgt_id") % 2 =!= 1).count() == 0)
    assert(out.groupBy("src_id").count().filter(col("count") > 1).count() == 0)

    val spark0 = spark
    val e = Tables.embeddings(spark0, sfDir).select(col("vec_id"), col("embedding"),
      graft.expr.NativeVecFns.rhpBucket(spark0, col("embedding"), 8).as("bucket"))
    val a = e.filter(col("vec_id") % 2 === 0)
      .select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.filter(col("vec_id") % 2 === 1)
      .select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val sims = a.join(b, Seq("bucket"))
      .withColumn("sim", VecFns.cosine(col("a_emb"), col("b_emb")))
      .select("a_id", "b_id", "sim")
    val k = 4
    val fw = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
    val bw = Window.partitionBy("b_id").orderBy(col("sim").desc, col("a_id").asc)
    val f = sims.withColumn("rn", row_number().over(fw)).filter(col("rn") <= k)
    val bk = sims.withColumn("rn", row_number().over(bw)).filter(col("rn") <= k)
    val avgF = f.groupBy("a_id").agg(avg("sim").as("avg_f"))
    val avgB = bk.groupBy("b_id").agg(avg("sim").as("avg_b"))
    val m = f.join(avgF, Seq("a_id")).join(avgB, Seq("b_id"))
      .withColumn("margin", col("sim") * 2 / (col("avg_f") + col("avg_b")))
    val mw = Window.partitionBy("a_id").orderBy(col("margin").desc, col("b_id").asc)
    val expect = m.withColumn("mr", row_number().over(mw))
      .filter(col("mr") === 1 && col("margin") >= 1.0)
      .select(col("a_id").as("src_id"), col("b_id").as("tgt_id"),
        round(col("sim"), 4).as("cosine_sim"), round(col("margin"), 4).as("margin"))

    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val exp = expect.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == exp, s"diff: got-exp=${(got -- exp).take(3)} exp-got=${(exp -- got).take(3)}")
    out.unpersist()
  }

  test("q144: blocked fuzzy join — pairs verified, corpus ASCII precondition holds") {
    // the oracle-agreement precondition (Spark codepoint vs DuckDB byte
    // levenshtein): every gate corpus is ASCII
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    assert(nonAscii == 0, "documents corpus contains non-ASCII text")

    val out = MiningQueries.q144FuzzyJoin(spark, sfDir).cache()
    assert(out.count() > 0, "planted near-dups should survive the prefix block")
    assert(out.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(out.filter(col("edit_dist") < 0 || col("edit_dist") > 24).count() == 0)
    // every emitted pair recomputes to the same distance from raw text
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 160).as("head"))
    val recheck = out
      .join(d.as("ra"), col("doc_a") === col("ra.doc_id"))
      .join(d.as("rb"), col("doc_b") === col("rb.doc_id"))
      .filter(levenshtein(col("ra.head"), col("rb.head")) =!= col("edit_dist"))
    assert(recheck.count() == 0)
    // exact-text duplicates must appear with distance 0
    val texts = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val exactPairs = texts.as("x").join(texts.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val missed = exactPairs.join(out.filter(col("edit_dist") === 0), Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() == 0, "an exact duplicate pair escaped the fuzzy join")
    out.unpersist()
  }

  test("q145: containment — exact on flagged pairs, exact copies flagged both ways") {
    val out = MiningQueries.q145Containment(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("containment") < 0.5 || col("containment") > 1.0).count() == 0)
    assert(out.filter(col("shared") > col("n_shingles")).count() == 0)
    // recompute containment for flagged pairs from the raw shingle sets
    val spark0 = spark
    val sets = Tables.documents(spark0, sfDir)
      .withColumn("th", graft.expr.NativeTextFns.tokenHashes(spark0, col("text")))
      .select(col("doc_id"),
        graft.expr.NativeTextFns.shingleHashes(spark0, col("th"), 3).as("sset"))
    val recheck = out.as("o")
      .join(sets.as("sa"), col("o.doc_id") === col("sa.doc_id"))
      .join(sets.as("sb"), col("o.contained_in") === col("sb.doc_id"))
      .withColumn("c2", round(size(array_intersect(col("sa.sset"), col("sb.sset"))).cast("double")
        / size(col("sa.sset")), 4))
      .filter(col("c2") =!= col("containment"))
    assert(recheck.count() == 0)
    // ground truth: exact text copies with >= 10 shingles must be flagged
    // in BOTH directions with containment 1.0
    val big = Tables.documents(spark0, sfDir)
      .withColumn("th", graft.expr.NativeTextFns.tokenHashes(spark0, col("text")))
      .filter(size(graft.expr.NativeTextFns.shingleHashes(spark0, col("th"), 3)) >= 10)
      .select(col("doc_id"), col("text"))
    val dup = big.as("x").join(big.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("contained_in"))
    val flagged = out.filter(col("containment") === 1.0).select("doc_id", "contained_in")
    assert(dup.join(flagged, Seq("doc_id", "contained_in"), "left_anti").count() == 0,
      "an exact copy pair escaped containment detection")
    out.unpersist()
  }
}
