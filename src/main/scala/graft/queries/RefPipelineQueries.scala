package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, to_json}
import graft.pipelines._
import graft.sources.WeightTxt

/** The reference pipelines (P1-P5) surfaced through the driver contract.
  *
  * These run on the reference's own fixtures (or inline/synthetic data),
  * not the sfDir tables, so they carry no DuckDB oracle — the driver
  * records a rows-only check; their value correctness is covered by the
  * golden/differential specs (ElectricityPipelineSpec's 122k-bucket
  * DuckDB diff, SensorMergePipelineSpec, JobReportPipelineSpec,
  * WeightPipelineSpec, MediaOpsSpec).
  */
object RefPipelineQueries {

  /** P1: weight TXT → EAV → pivot → weekly resample with period change. */
  def p1Weight(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def file(date: String, w: String, bmi: String) =
      s"hdr\nTime:08:00, Mon,$date\nWeight:${w}kg ↑ Overweight\nBMI:$bmi ↑\nBMR:1800kcal"
    val eav = (WeightTxt.parseContent(file("2025-11-24", "91.0", "27.4"), "a.txt") ++
      WeightTxt.parseContent(file("2025-12-01", "90.4", "27.3"), "b.txt") ++
      WeightTxt.parseContent(file("2025-12-08", "89.9", "27.1"), "c.txt")).toDF()
    WeightPipeline.weeklyResample(WeightPipeline.pivoted(eav))
  }

  /** P2: one real sensor's exports folded into the merged wide series. */
  def p2SensorMerge(spark: SparkSession, dir: String): DataFrame = {
    val groups = SensorMergePipeline.discover("/root/reference/data")
    val (_, paths) = groups.minBy(_._1)
    SensorMergePipeline.finalize(SensorMergePipeline.mergeSensor(spark, paths).get)
  }

  /** P3: the electricity chain on the reference CSV → 15-minute usage. */
  def p3Electricity(spark: SparkSession, dir: String): DataFrame =
    ElectricityPipeline.run(spark,
      "/root/reference/utils/For Pandas and Polars --- Electricity.csv")

  /** P4: the MHTML job snapshots → deduped, grouped activity table.
    * The nested snapshots array is serialized to JSON for the driver's
    * pandas-based row check (arrays are unsortable/unhashable there);
    * the typed pipeline output is what JobReportPipelineSpec covers. */
  def p4JobReport(spark: SparkSession, dir: String): DataFrame =
    JobReportPipeline.grouped(
      JobReportPipeline.readBlocks(spark, "/root/reference/utils/job_search_mhtml"),
      cutoff = "2020-01-01")
      .withColumn("snapshots", to_json(col("snapshots")))

  /** P5/multimodal: synthetic media → distributed feature extraction →
    * LSH buckets. */
  def p5MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.MediaOps.featureBuckets(
      graft.multimodal.MediaOps.imageFeatures(
        graft.multimodal.MediaOps.syntheticMedia(spark, 2000)))
      .withColumn("features", to_json(col("features")))

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_weight_weekly" -> (p1Weight _),
    "p2_sensor_merge" -> (p2SensorMerge _),
    "p3_electricity_15min" -> (p3Electricity _),
    "p4_job_report" -> (p4JobReport _),
    "p5_media_features" -> (p5MediaFeatures _)
  )

  /** No oracle SQL — rows-only checks (see class doc). */
  def sql: Map[String, String] = Map.empty
}
