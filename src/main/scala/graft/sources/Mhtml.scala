package graft.sources

/** Minimal MHTML (MIME multipart/related) reader — enough surface for the
  * job-snapshot ETL (SURVEY P4; ref: utils/loose_thoughts.py:137-153):
  * find the boundary, walk parts, pick `text/html`, decode
  * quoted-printable, strip tags to text lines.
  *
  * Hand-rolled because the container ships no HTML parser dependency;
  * all pure functions — safe to call from executor-side `flatMap`.
  */
object Mhtml {

  /** Boundary token from the top-level Content-Type header. */
  def boundary(raw: String): Option[String] = {
    val m = """boundary="?([^"\r\n;]+)"?""".r.findFirstMatchIn(raw.take(4096))
    m.map(_.group(1))
  }

  /** Split the document into MIME parts: (headerBlock, body) pairs. */
  def parts(raw: String): Seq[(String, String)] =
    boundary(raw) match {
      case None => Seq.empty
      case Some(b) =>
        raw.split(java.util.regex.Pattern.quote("--" + b)).toSeq.drop(1)
          .filterNot(_.trim.startsWith("--")) // closing marker
          .flatMap { part =>
            val idx = part.indexOf("\r\n\r\n") match {
              case -1 => part.indexOf("\n\n")
              case i  => i
            }
            if (idx < 0) None
            else Some((part.substring(0, idx), part.substring(idx).dropWhile(c => c == '\r' || c == '\n')))
          }
    }

  /** First `text/html` part's body, quoted-printable-decoded when the
    * part declares that transfer encoding. */
  def htmlPart(raw: String): Option[String] =
    parts(raw).find(_._1.toLowerCase.contains("text/html")).map { case (hdr, body) =>
      if (hdr.toLowerCase.contains("quoted-printable")) decodeQuotedPrintable(body) else body
    }

  /** RFC 2045 quoted-printable: soft line breaks `=\n` removed, `=XX`
    * hex escapes decoded (UTF-8 multi-byte sequences handled by decoding
    * the full byte run). */
  def decodeQuotedPrintable(s: String): String = {
    val noSoft = s.replaceAll("=\r?\n", "")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < noSoft.length) {
      val c = noSoft.charAt(i)
      if (c == '=' && i + 2 < noSoft.length &&
          isHex(noSoft.charAt(i + 1)) && isHex(noSoft.charAt(i + 2))) {
        out.write(Integer.parseInt(noSoft.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        out.write(c.toString.getBytes("UTF-8"))
        i += 1
      }
    }
    new String(out.toByteArray, "UTF-8")
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** HTML → visible text lines: script/style dropped, block-level tags
    * become newlines, remaining tags stripped, basic entities decoded,
    * NBSP normalized (ref: loose_thoughts_TD2.py:57), lines trimmed and
    * blanks dropped. */
  def htmlToTextLines(html: String): Seq[String] = {
    val noScript = html
      .replaceAll("(?is)<(script|style|head)[^>]*>.*?</\\1>", " ")
      .replaceAll("(?is)<!--.*?-->", " ")
    val withBreaks = noScript
      .replaceAll("(?i)<(br|/p|/div|/tr|/li|/h[1-6]|/td|/table|/ul)[^>]*>", "\n")
    val noTags = withBreaks.replaceAll("(?s)<[^>]*>", "")
    val decoded = noTags
      .replace("&nbsp;", " ").replace(" ", " ")
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
    decoded.split("\n").iterator.map(_.trim.replaceAll("\\s+", " ")).filter(_.nonEmpty).toSeq
  }

  /** Tables as rows of `" | "`-joined cell text
    * (ref: loose_thoughts_TD2.py:41-60). */
  def tableRows(html: String): Seq[String] = {
    val tablePat = "(?is)<table[^>]*>(.*?)</table>".r
    val trPat = "(?is)<tr[^>]*>(.*?)</tr>".r
    val cellPat = "(?is)<t[hd][^>]*>(.*?)</t[hd]>".r
    tablePat.findAllMatchIn(html).toSeq.flatMap { t =>
      trPat.findAllMatchIn(t.group(1)).map { tr =>
        cellPat.findAllMatchIn(tr.group(1))
          .map(c => htmlToTextLines(c.group(1)).mkString(" ").trim)
          .mkString(" | ")
      }.filter(_.nonEmpty)
    }
  }
}
