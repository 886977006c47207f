package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.NativeVecFns

/** Cross-engine float-safety audit for q122 (IVF-PQ): measures the two
  * argmin/rank margins that must dominate summation-order wobble for the
  * DuckDB oracle to hash-match the Spark plan —
  *  1. the ENCODE margin: per (vector, subspace), the gap between the
  *     nearest and second-nearest codebook entry (a flip here changes a
  *     stored code);
  *  2. the RANK margin: per probe, the adc_sim gap at the top-3 boundary
  *     (rank 3 vs rank 4 — a flip here changes the reported neighbor).
  * Both engines compute the identical double-arithmetic chains, so the
  * only divergence source is ~1e-16-relative wobble; margins orders of
  * magnitude above that make the hash-compare sound. Same protocol as
  * q74/q89's documented margins. Usage: `PqMarginProbe <sfDir>`. */
object PqMarginProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val ks = graft.ml.ProductQuantizer.ksFor(e.count())
    val book = graft.ml.ProductQuantizer.train(e, 64, 8, ks, 2, denom = 4)

    // encode margin: dist gap between rn=1 and rn=2 per (vec_id, s)
    val sub = 64 / 8
    val w = Window.partitionBy("vec_id", "s").orderBy(col("dist_sq").asc, col("code").asc)
    val ranked = e.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(7))).as("s"))
      .withColumn("subv", slice(col("embedding"), col("s") * lit(sub) + lit(1), lit(sub)))
      .join(broadcast(book), Seq("s"))
      .withColumn("dist_sq", NativeVecFns.l2DistSq(spark, col("subv"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    val encMargin = ranked.groupBy("vec_id", "s")
      .agg((max(when(col("rn") === 2, col("dist_sq")))
        - max(when(col("rn") === 1, col("dist_sq")))).as("gap"))
      .agg(min("gap")).first().getDouble(0)

    // rank margin: per probe, sim(rank 3) - sim(rank 4) over the q122
    // candidate set (unrounded sims)
    val (rb, rcRoot) = {
      // inline rebuild of the q122 store pieces (the query memoizes per
      // process; this probe is standalone)
      val cids = graft.ml.KMeans.assign(e,
        { val (c, _) = graft.ml.KMeans.fit(e, 32, 2); c })
        .select(col("vec_id"), col("cid"))
      val codes = graft.ml.ProductQuantizer.encode(e, book, 64, 8).join(cids, Seq("vec_id"))
      (book, codes)
    }
    val cand = graft.ml.ProductQuantizer.withRecon(spark, rcRoot, rb, 8)
      .select(col("cid"), col("vec_id").as("b_id"), col("recon"), col("rnrm"))
    val cents = { val (c, _) = graft.ml.KMeans.fit(e, 32, 2); c }
    val probes = e.select(col("vec_id"), col("embedding"),
        NativeVecFns.norm(spark, col("embedding")).as("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("dist_sq", NativeVecFns.l2DistSq(spark, col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist_sq").asc, col("cid").asc)))
      .filter(col("rn") <= 2)
      .select(col("cid"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val sims = probes.join(cand, Seq("cid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim",
        NativeVecFns.dot(spark, col("a_emb"), col("recon")) / (col("a_nrm") * col("rnrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)))
      .filter(col("rk") <= 4)
    val rankMargin = sims.groupBy("a_id")
      .agg((max(when(col("rk") === 3, col("sim")))
        - max(when(col("rk") === 4, col("sim")))).as("gap"))
      .filter(col("gap").isNotNull)
      .agg(min("gap")).first().getDouble(0)

    println(f"""{"sf":"$sfDir","ks":$ks,"min_encode_margin":$encMargin%.3e,"min_rank3_margin":$rankMargin%.3e}""")
    spark.stop()
  }
}
