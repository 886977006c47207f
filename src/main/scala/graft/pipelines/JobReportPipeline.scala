package graft.pipelines

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Mhtml

/** One captured activity block: the record shape of SURVEY §1.1 shape 4
  * (ref: utils/loose_thoughts.py:233-238). */
case class JobBlock(
    block_date: java.sql.Date,
    file_label: String,
    status: String,
    lines: Seq[String])

/** The MHTML job-activity ETL (SURVEY P4; ref: utils/loose_thoughts.py):
  * MIME walk → HTML text → stateful block capture → relative-date
  * resolution → status detection → dedup → group by job → two-level sort
  * → Markdown report.
  *
  * Spark-first shape: the per-file stateful line scan is a pure function
  * of one file's text → a typed `flatMap` over `binaryFile` rows (a
  * UDTF in SURVEY §2.10 terms); everything after is relational
  * (`dropDuplicates` on the array column, `groupBy` + `collect_list`,
  * `sort_array`). Only the final ≪-memory report render collects.
  */
object JobReportPipeline {

  private val CaptureStart = "your recent activity"
  private val CaptureEnd = "show deleted jobs"

  /** Status keywords in priority order (ref :161-168). */
  val StatusPriority: Seq[String] = Seq(
    "no longer considering", "unsuccessful", "successful",
    "rejected", "viewed", "applied")

  def detectStatus(text: String): Option[String] = {
    val lc = text.toLowerCase
    StatusPriority.find(lc.contains)
  }

  /** "N days ago" → concrete date against the snapshot's file date
    * (ref :191-196); "Updated on <date-ish>" lines otherwise keep the
    * file date (conservative: the reference also falls back). */
  def resolveRelativeDate(line: String, fileDate: LocalDate): LocalDate = {
    val daysAgo = """(\d+)\s+day""".r.findFirstMatchIn(line.toLowerCase)
    daysAgo.map(m => fileDate.minusDays(m.group(1).toLong)).getOrElse(fileDate)
  }

  /** Snapshot date from the filename prefix `yyyyMMdd…` (ref :41-49). */
  def fileDate(fileName: String): Option[LocalDate] = {
    val prefix = fileName.take(8)
    if (prefix.length == 8 && prefix.forall(_.isDigit))
      scala.util.Try(LocalDate.parse(prefix, DateTimeFormatter.BASIC_ISO_DATE)).toOption
    else None
  }

  /** Stateful block capture over one file's text lines (ref :157-243):
    * capture between the activity markers; a block closes at its
    * "Updated on …" line, which also carries the relative date; status
    * may sit on the terminator or the line before it (ref :208-214);
    * "Update job" noise lines are skipped. */
  def captureBlocks(fileName: String, textLines: Seq[String]): Seq[JobBlock] = {
    val fd = fileDate(fileName).getOrElse(LocalDate.of(1970, 1, 1))
    val label = fileName
    val out = scala.collection.mutable.ListBuffer.empty[JobBlock]
    var capturing = false
    var current = scala.collection.mutable.ListBuffer.empty[String]
    for (line <- textLines) {
      val lc = line.toLowerCase
      if (!capturing && lc.contains(CaptureStart)) capturing = true
      else if (capturing && lc.contains(CaptureEnd)) {
        capturing = false
      } else if (capturing) {
        if (lc == "update job") () // noise (FIXTURES A5)
        else if (lc.startsWith("updated on")) {
          if (current.nonEmpty) {
            val date = resolveRelativeDate(line, fd)
            val blockLines = current.toSeq :+ line
            val status = blockLines.reverseIterator.flatMap(detectStatus).toSeq.headOption
              .getOrElse("unknown")
            out += JobBlock(java.sql.Date.valueOf(date), label, status, blockLines)
          }
          current = scala.collection.mutable.ListBuffer.empty[String]
        } else current += line
      }
    }
    out.toSeq
  }

  /** Directory of .mhtml snapshots → Dataset[JobBlock]. Reads with the
    * `binaryFile` source so MIME bytes are decoded executor-side. */
  def readBlocks(spark: SparkSession, dir: String): Dataset[JobBlock] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mhtml")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val raw = new String(bytes, "UTF-8")
        Mhtml.htmlPart(raw).toSeq.flatMap { html =>
          captureBlocks(name, Mhtml.htmlToTextLines(html))
        }
      }
  }

  /** Relational tail: cutoff filter → signature dedup (array equality,
    * ref :227-232) → group by job identity (first line) → snapshots
    * sorted date-desc within job, jobs sorted by latest date desc.
    *
    * Dedup keeps the earliest (file_label, block_date) occurrence — the
    * reference iterates files in sorted order and keeps the first-seen
    * signature, so min file_label IS its semantics; `dropDuplicates`
    * would pick an arbitrary survivor and make the output
    * parallelism-dependent. */
  def grouped(blocks: Dataset[JobBlock], cutoff: String): DataFrame = {
    val firstSeen = org.apache.spark.sql.expressions.Window
      .partitionBy("lines").orderBy(col("file_label"), col("block_date"))
    blocks.toDF()
      .filter(col("block_date") >= lit(cutoff))
      .withColumn("__rn", row_number().over(firstSeen))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("job", element_at(col("lines"), 1))
      .groupBy("job")
      .agg(
        count(lit(1)).as("n_snapshots"),
        max("block_date").as("latest_date"),
        reverse(sort_array(collect_list(struct(
          col("block_date"), col("file_label"), col("status"), col("lines")))))
          .as("snapshots"))
      .orderBy(col("latest_date").desc, col("job").asc)
  }

  /** Driver-side Markdown render (report ≪ memory; ref :121-134). */
  def renderMarkdown(groupedDf: DataFrame): String = {
    val sb = new StringBuilder("# Job activity report\n")
    groupedDf.collect().foreach { row =>
      val job = row.getAs[String]("job")
      val n = row.getAs[Long]("n_snapshots")
      sb.append(s"\n## $job  ($n snapshots)\n")
      row.getAs[Seq[org.apache.spark.sql.Row]]("snapshots").foreach { snap =>
        val d = snap.getAs[java.sql.Date]("block_date")
        val st = snap.getAs[String]("status")
        sb.append(s"- $d [$st] ${snap.getAs[String]("file_label")}\n")
        snap.getAs[Seq[String]]("lines").drop(1).foreach(l => sb.append(s"    $l\n"))
      }
    }
    sb.toString
  }

  def run(spark: SparkSession, dir: String, cutoff: String): String =
    renderMarkdown(grouped(readBlocks(spark, dir), cutoff))

  /** Timestamped report-file sink (ref :121-134); caller supplies the
    * stamp so runs stay reproducible. */
  def writeReport(report: String, outDir: String, stamp: String): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(s"job_report_$stamp.md"), report)
  }
}
