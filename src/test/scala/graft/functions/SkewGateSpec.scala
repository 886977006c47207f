package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The skew ROBUSTNESS gate: on a Zipf-skewed twin of the events table
  * (one hot key at ~20% mass — graft.tools.SkewGen), MEASURE the
  * per-task input of the shuffle layouts the salted paths (q52/q60)
  * produce, against the naive key-hash layouts. The salted claims stop
  * being design prose and become bounds this spec would fail if the salt
  * ever stopped spreading the hot key.
  *
  * Per-task input is measured on the REAL exchange layout: repartition
  * by the exact key expressions (HashPartitioning — the same layout any
  * keyed shuffle uses) and count rows per spark_partition_id.
  */
class SkewGateSpec extends SparkSpec {

  private val Parts = 32

  /** rows per partition under HashPartitioning(exprs, Parts). */
  private def perTask(df: DataFrame, exprs: org.apache.spark.sql.Column*): Seq[Long] =
    df.repartition(Parts, exprs: _*)
      .select(spark_partition_id().as("p"))
      .groupBy("p").count().collect().map(_.getLong(1)).toSeq

  private def skewed = graft.tools.SkewGen.skewedEvents(
    graft.core.Tables.events(spark, sfDir))

  test("skewed twin really is skewed: hot key holds ~20% mass, tail is Zipf-shaped") {
    val df = skewed
    val n = df.count().toDouble
    val hot = df.filter(col("user_id") === 0L).count().toDouble
    assert(hot / n > 0.15 && hot / n < 0.25, s"hot share ${hot / n} must be ~0.2")
    // Zipf tail: the top non-hot key is far above the median key's count
    val tail = df.filter(col("user_id") =!= 0L).groupBy("user_id").count()
      .select("count").collect().map(_.getLong(0)).sorted
    assert(tail.last > 4 * tail(tail.length / 2),
      s"tail must be heavy (top ${tail.last} vs median ${tail(tail.length / 2)})")
  }

  test("agg keying: naive funnels the hot key into one task; salted stays near-uniform (measured)") {
    val df = skewed
    val n = df.count().toDouble
    val naive = perTask(df, col("user_id"))
    val naiveShare = naive.max / n
    // the hot key's whole ~20% mass lands in a single hash partition
    assert(naiveShare > 0.15,
      s"naive layout must concentrate the hot key: max share $naiveShare")
    // q52's phase-1 layout: (key, salt) — the hot key spreads over 16
    // sub-keys, so the hottest task carries ~20%/16 + background ≈ 4.4%
    val salted = perTask(
      df.withColumn("_salt", pmod(hash(col("event_id"), col("value")), lit(16))),
      col("user_id"), col("_salt"))
    val saltedShare = salted.max / n
    assert(saltedShare < 0.08, s"salted layout must bound per-task input: $saltedShare")
    assert(saltedShare * 3 < naiveShare,
      s"salting must beat naive by >3x: $saltedShare vs $naiveShare")
    info(f"per-task max share: naive $naiveShare%.3f -> salted $saltedShare%.3f")
  }

  test("join keying: salted sort-merge layout bounds the probe side the naive key cannot") {
    // the q60 shape if the dim side ever outgrows broadcast: an SMJ
    // shuffles BOTH sides by the key — the hot key's probe rows all meet
    // in one task. The salted layout (key, salt) keeps every task's
    // probe input bounded; the dim side replicates `buckets` times
    // (16 * |dim| rows — still dim-sized, the documented trade).
    val df = skewed
    val n = df.count().toDouble
    val naiveShare = perTask(df, col("user_id")).max / n
    val salted = perTask(
      df.withColumn("_salt", pmod(hash(col("event_id")), lit(16))),
      col("user_id"), col("_salt"))
    assert(salted.max / n < 0.08 && naiveShare > 0.15,
      s"salted ${salted.max / n} vs naive $naiveShare")
  }

  test("AQE skew join splits the hot partition at runtime (the no-salt lever)") {
    // salting (above) is the WRITE-TIME skew answer; AQE's skew join is
    // the RUNTIME one — prove the engine lever actually fires on our
    // Zipf twin, so the 100 TB story doesn't depend on hand-salting
    // every join. Thresholds are floored to 1 byte because skew
    // detection runs on COMPRESSED shuffle bytes and the toy-scale hot
    // partition is a run of identical keys — lz4 squeezes it under the
    // kilobyte defaults (a disguise real mixed-payload rows don't
    // have). The mechanism (OptimizeSkewedJoin splitting the oversized
    // partition into parallel sub-reads) is the same one production
    // sizes trigger at the default thresholds.
    import spark.implicits._
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // 32 partitions: the Zipf tail spreads thin, so the hot key's
      // partition clears factor×median on real shuffle bytes
      "spark.sql.shuffle.partitions" -> "32") {
      // sf0.01: the hot partition must clear factor×median at real bytes
      val big = graft.tools.SkewGen.skewedEvents(
        graft.core.Tables.events(spark, "/root/testdata/sf0.01"))
      val dim = (0L until 1001L).map(k => (k, k % 7)).toDF("user_id", "seg")
      val j = big.join(dim, Seq("user_id")).groupBy("seg").count()
      // AQE finalizes the plan at execution — materialize j ITSELF, then
      // read its (now final) adaptive plan
      val got = j.collect().map(_.getLong(1)).sum
      val expected = big.groupBy("user_id").count()
        .filter(col("user_id") < 1001L).agg(sum("count")).collect()(0).getLong(0)
      assert(got == expected, "skew-split join must not change results")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"AQE must mark the skewed join in the final plan:\n$plan")
    }
  }

  test("salted aggregation result is unchanged on the skewed twin (correctness under skew)") {
    val df = skewed.select(col("user_id"), col("event_id"), col("value"))
    val plain = df.groupBy("user_id").agg(sum("value").as("v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (math.round(r.getDouble(1) * 1e6), r.getLong(2)))).toMap
    val salted = SkewFns.saltedSumCount(df, Seq("user_id"), "value", buckets = 16)
      .collect().map(r => (r.getLong(0), (math.round(r.getDouble(1) * 1e6), r.getLong(2)))).toMap
    assert(plain == salted)
  }

  test("salted broadcast join result is unchanged on the skewed twin") {
    import spark.implicits._
    val dim = (0L until 1001L).map(k => (k, s"seg${k % 7}")).toDF("user_id", "segment")
    val plain = skewed.join(dim, Seq("user_id")).groupBy("segment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewFns.saltedBroadcastJoin(skewed, dim, "user_id", buckets = 16)
      .groupBy("segment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }
}
