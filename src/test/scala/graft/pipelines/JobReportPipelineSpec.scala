package graft.pipelines

import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.sources.Mhtml

class JobReportPipelineSpec extends SparkSpec {

  // --- Mhtml unit surface -------------------------------------------------

  test("quoted-printable decode: hex escapes, soft breaks, UTF-8 runs") {
    assert(Mhtml.decodeQuotedPrintable("a=20b") == "a b")
    assert(Mhtml.decodeQuotedPrintable("long=\r\nline") == "longline")
    assert(Mhtml.decodeQuotedPrintable("=E2=86=91") == "↑")
    assert(Mhtml.decodeQuotedPrintable("x=ZZy") == "x=ZZy") // not hex → literal
  }

  test("html → text lines: tags stripped, blocks break lines, entities decoded, nbsp normalized") {
    val html = "<html><head><style>p{}</style></head><body>" +
      "<p>Hello&nbsp;World</p><div>Second&amp;Line</div><script>var x=1;</script></body></html>"
    assert(Mhtml.htmlToTextLines(html) == Seq("Hello World", "Second&Line"))
  }

  test("table extraction: rows as ' | '-joined cells (ref loose_thoughts_TD2)") {
    val html = "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>"
    assert(Mhtml.tableRows(html) == Seq("A | B", "1 | 2"))
  }

  // --- block capture ------------------------------------------------------

  private val lines = Seq(
    "junk before",
    "Your recent activity",
    "Data Engineer at Acme",
    "Applied",
    "Updated on 2 days ago",
    "Update job", // noise
    "Data Engineer at Acme",
    "No longer considering",
    "Updated on 1 day ago",
    "Show deleted jobs",
    "junk after")

  test("stateful capture: blocks bounded by markers and 'Updated on', noise skipped, dates resolved") {
    val blocks = JobReportPipeline.captureBlocks("20251205 - snap.mhtml", lines)
    assert(blocks.length == 2)
    assert(blocks(0).block_date.toString == "2025-12-03") // 2 days before Dec 5
    assert(blocks(1).block_date.toString == "2025-12-04")
    assert(blocks(0).status == "applied")
    assert(blocks(1).status == "no longer considering") // priority over nothing else
    assert(blocks(0).lines.head == "Data Engineer at Acme")
  }

  test("status priority: 'no longer considering' beats 'viewed' wherever it appears") {
    assert(JobReportPipeline.detectStatus("Viewed — no longer considering") ==
      Some("no longer considering"))
    assert(JobReportPipeline.StatusPriority.head == "no longer considering")
  }

  // --- end-to-end on a synthetic MHTML -----------------------------------

  private def syntheticMhtml(body: String): String =
    "MIME-Version: 1.0\r\n" +
      "Content-Type: multipart/related; boundary=\"----=_Part_0\"\r\n\r\n" +
      "------=_Part_0\r\n" +
      "Content-Type: text/html; charset=\"utf-8\"\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      body + "\r\n" +
      "------=_Part_0--\r\n"

  test("end-to-end: mhtml dir → deduped grouped report") {
    val dir: Path = Files.createTempDirectory("mhtml")
    val html = "<html><body><p>Your recent activity</p>" +
      "<p>Data Engineer at Acme</p><p>Applied</p><p>Updated on 2 days ago</p>" +
      "<p>Show deleted jobs</p></body></html>"
    // same block in two snapshots → dedup to one
    Files.writeString(dir.resolve("20251205 - a.mhtml"), syntheticMhtml(html))
    Files.writeString(dir.resolve("20251207 - b.mhtml"), syntheticMhtml(html))
    val blocks = JobReportPipeline.readBlocks(spark, dir.toString)
    assert(blocks.count() == 2)
    val grouped = JobReportPipeline.grouped(blocks, "2020-01-01")
    val rows = grouped.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("job") == "Data Engineer at Acme")
    // identical line-signatures dedup to one snapshot (ref :227-232)
    assert(rows(0).getAs[Long]("n_snapshots") == 1)
    val report = JobReportPipeline.renderMarkdown(grouped)
    assert(report.contains("## Data Engineer at Acme"))
  }

  test("cutoff filters old blocks") {
    val dir: Path = Files.createTempDirectory("mhtml2")
    val html = "<html><body><p>Your recent activity</p>" +
      "<p>Old Job</p><p>Updated on 300 days ago</p>" +
      "<p>New Job</p><p>Updated on 1 day ago</p>" +
      "<p>Show deleted jobs</p></body></html>"
    Files.writeString(dir.resolve("20251205 - a.mhtml"), syntheticMhtml(html))
    val grouped = JobReportPipeline.grouped(
      JobReportPipeline.readBlocks(spark, dir.toString), "2025-11-01")
    assert(grouped.collect().map(_.getAs[String]("job")).toSeq == Seq("New Job"))
  }

  test("smoke: real reference snapshots parse into blocks") {
    val blocks = JobReportPipeline.readBlocks(spark, "/root/reference/utils/job_search_mhtml")
    val n = blocks.count()
    info(s"reference snapshots → $n blocks")
    assert(n > 0)
  }
}
