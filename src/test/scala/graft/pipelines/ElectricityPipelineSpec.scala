package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-engine differential test — the reference's own oracle method
  * (SURVEY §5.1): the full pipeline on the real reference CSV, compared
  * bucket-by-bucket against an independent DuckDB implementation of the
  * same semantics (src/test/resources/electricity_golden.csv, generated
  * by tools — see repo history). */
class ElectricityPipelineSpec extends SparkSpec {

  private val csv = "/root/reference/utils/For Pandas and Polars --- Electricity.csv"
  private val golden = getClass.getResource("/electricity_golden.csv").getPath

  test("15-minute usage matches the DuckDB golden output on the reference CSV") {
    val usage = ElectricityPipeline.run(spark, csv).cache()
    val g = spark.read.option("header", "true")
      .schema("Bucket TIMESTAMP, First_Minute TIMESTAMP, Last_Minute TIMESTAMP, Minutes LONG, P_Usage DOUBLE, OP_Usage DOUBLE")
      .csv(golden)

    assert(usage.count() == g.count(), "bucket count differs from golden")

    val joined = usage.as("s").join(g.as("g"), col("s.Bucket") === col("g.Bucket"), "full_outer")
    val mism = joined.filter(
      col("s.Bucket").isNull || col("g.Bucket").isNull ||
        col("s.Minutes") =!= col("g.Minutes") ||
        col("s.First_Minute") =!= col("g.First_Minute") ||
        col("s.Last_Minute") =!= col("g.Last_Minute") ||
        !(abs(coalesce(col("s.P_Usage"), lit(0.0)) - coalesce(col("g.P_Usage"), lit(0.0))) < 1e-5) ||
        !(abs(coalesce(col("s.OP_Usage"), lit(0.0)) - coalesce(col("g.OP_Usage"), lit(0.0))) < 1e-5))
    val n = mism.count()
    if (n > 0) mism.show(5, truncate = false)
    assert(n == 0, s"$n mismatching buckets vs golden")
    usage.unpersist()
  }

  test("telescoping invariant: ΣP_Usage = last(P) − first(P) (SURVEY §5.3)") {
    val raw = ElectricityPipeline.read(spark, csv)
      .orderBy("LocalDateTime").select("P", "OP").collect()
    val expectedP = raw.last.getDouble(0) - raw.head.getDouble(0)
    val expectedOp = raw.last.getDouble(1) - raw.head.getDouble(1)
    val s = ElectricityPipeline.summary(ElectricityPipeline.run(spark, csv)).collect()(0)
    assert(math.abs(s.getAs[Double]("total_p") - expectedP) < 1e-6)
    assert(math.abs(s.getAs[Double]("total_op") - expectedOp) < 1e-6)
  }

  test("boundary buckets exist at the peak-window edges (the reference's spot check)") {
    val usage = ElectricityPipeline.run(spark, csv)
    assert(ElectricityPipeline.boundaryBuckets(usage).count() > 0)
  }
}
