package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A single EAV reading parsed from a weight-tracker TXT export.
  * Schema contract (8 string columns, ref:
  * utils/20251223-weight-for-streamlit.py:139): all values are raw strings
  * at ingest; typing happens downstream (SURVEY §1.1 shape 1). */
case class WeightReading(
    day_name: String,
    date: String,
    time: String,
    attribute: String,
    value: String,
    info_symbol: String,
    info_txt: String,
    source_file_id: String)

/** Source for the reference's custom TXT export format (ref:
  * utils/20251223-weight-for-streamlit.py:38-74; FIXTURES.md §A3):
  *
  * {{{
  * <ignored first line>
  * Time:08:22, Fri,12/ 19/2025
  * Weight:90.4kg  ↑   Overweight
  * BMI:27.3  ↑   Overweight
  * }}}
  *
  * Implemented as a typed `flatMap` over whole files — the parse is a pure
  * function of (fileId, content), so it distributes over however many
  * files exist; a 100 TB corpus of small files is read with Spark's
  * `wholetext` reader and parsed executor-side (no driver loop).
  */
object WeightTxt {

  /** Parse one file's content into EAV rows. Files with fewer than 3
    * lines or no parseable header yield no rows (ref behavior: skip). */
  def parseContent(content: String, fileId: String): Seq[WeightReading] = {
    val lines = content.split("\n", -1).map(_.trim).toSeq
    if (lines.length < 3) return Seq.empty
    // header: "Time:08:22, Fri,12/ 19/2025" → time, day_name, date
    val header = lines(1)
    if (!header.startsWith("Time:")) return Seq.empty
    val headerParts = header.stripPrefix("Time:").split(",").map(_.trim)
    if (headerParts.length < 3) return Seq.empty
    val time = headerParts(0)
    val dayName = headerParts(1)
    val date = headerParts(2) // may contain an inner space: "12/ 19/2025"
    lines.drop(2).filter(l => l.nonEmpty && l.contains(":")).map { line =>
      val Array(attribute, rest) = line.split(":", 2)
      val tokens = rest.trim.split("\\s+")
      val value = tokens(0).replace("kg", "").replace("%", "").replace("kcal", "")
      val infoSymbol = if (tokens.length > 1) tokens(1) else ""
      val infoTxt = if (tokens.length > 2) tokens.drop(2).mkString(" ") else ""
      WeightReading(dayName, date, time, attribute.trim, value, infoSymbol, infoTxt, fileId)
    }
  }

  /** Read a directory/glob of TXT exports into the 8-column EAV table.
    * One input row per file (`wholetext`), file identity from the path. */
  def read(spark: SparkSession, pathGlob: String): DataFrame =
    read(spark, Seq(pathGlob))

  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true").text(paths: _*)
      .select(input_file_name().as("path"), col("value").as("content"))
      .as[(String, String)]
    val parsed: Dataset[WeightReading] = files.flatMap { case (path, content) =>
      val fileId = path.substring(path.lastIndexOf('/') + 1)
      parseContent(content, fileId)
    }
    parsed.toDF()
  }
}
