package graft.pipelines

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CSV / report sinks (SURVEY §2.1 sink rows). */
class SinkSpec extends SparkSpec {

  test("sensor CSV sink: one header CSV per sensor, sanitized name, round-trips") {
    val d = Files.createTempDirectory("sinksrc")
    Files.writeString(d.resolve("A (1)_export_202511210000.csv"),
      "﻿Timestamp,Temp\n2025-11-20 01:00:00,10.0\n2025-11-20 01:01:00,11.0\n")
    val merged = SensorMergePipeline.run(spark, d.toString)
    val out = Files.createTempDirectory("sinkout").toString
    val written = SensorMergePipeline.writeCsv(merged, out)
    assert(written.size == 1 && written.head.endsWith("A (1)"))
    val back = spark.read.option("header", "true").csv(written.head)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("Timestamp", "Temp"))
  }

  test("electricity CSV sink writes the single-file bucket table") {
    import spark.implicits._
    val usage = Seq(("2024-01-01 00:00:00", 15L, 1.5)).toDF("Bucket", "Minutes", "P_Usage")
    val out = Files.createTempDirectory("elecout").toString + "/usage"
    ElectricityPipeline.writeCsv(usage, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1, "coalesce(1) must yield one part file")
    assert(spark.read.option("header", "true").csv(out).count() == 1)
  }

  test("job report sink writes the stamped markdown file") {
    val out = Files.createTempDirectory("report").toString
    val p = JobReportPipeline.writeReport("# Job activity report\n", out, "20251205")
    assert(p.getFileName.toString == "job_report_20251205.md")
    assert(Files.readString(p).startsWith("# Job activity report"))
  }
}
