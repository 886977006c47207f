package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightTxtV2Spec extends SparkSpec {

  test("spark.read.format(weighttxt) reads a directory, one partition per file") {
    val dir = Files.createTempDirectory("wtxtv2")
    Files.writeString(dir.resolve("a.txt"),
      "h\nTime:08:22, Fri,12/ 19/2025\nWeight:90.4kg ↑ Overweight\nBMI:27.3 ↑\n")
    Files.writeString(dir.resolve("b.txt"),
      "h\nTime:07:10, Sat,12/ 20/2025\nWeight:90.1kg ↓\n")
    val df = spark.read.format("graft.sources.WeightTxtV2").load(dir.toString)
    assert(df.columns.toSeq == Seq("day_name", "date", "time", "attribute",
      "value", "info_symbol", "info_txt", "source_file_id"))
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions == 2, "one input partition per file")
    val w = df.filter(col("attribute") === "Weight" && col("source_file_id") === "a.txt")
      .collect()(0)
    assert(w.getAs[String]("value") == "90.4")
    assert(w.getAs[String]("info_txt") == "Overweight")
  }

  test("DSv2 output matches the flatMap source on the same files") {
    val dir = Files.createTempDirectory("wtxtv2b")
    Files.writeString(dir.resolve("a.txt"),
      "h\nTime:08:22, Fri,12/19/2025\nWeight:90.4kg\nBMI:27.3\nBMR:1800kcal\n")
    val v2 = spark.read.format("graft.sources.WeightTxtV2").load(dir.toString)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val v1 = WeightTxt.read(spark, dir.toString + "/*.txt")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(v2 == v1)
  }
}
