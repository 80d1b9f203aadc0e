package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame

/** S9 — the PDF report (`etl_pipeline/load/report_generator.py:203-214`:
  * the reference feeds its rendered HTML to WeasyPrint when installed,
  * and degrades to HTML-only otherwise). Here the same report document
  * — title, run date, the capped table sections — is written as a
  * minimal PDF 1.4 file with the JDK stdlib alone, the same
  * no-third-party discipline as the XLSX sink (a zip of XML there, a
  * byte-offset object graph here).
  *
  * Structure: catalog → page tree → Courier/Courier-Bold Type1 fonts
  * (two of the 14 standard PDF fonts every reader must ship, so no
  * embedding) → one page + uncompressed content stream per ~54 lines.
  * Courier is deliberate: fixed-pitch makes space-padded table columns
  * align exactly, which is the whole typography a tabular report needs.
  * The cross-reference table is generated from the actual byte offsets,
  * and tests verify each entry resolves to its `N 0 obj` header —
  * a malformed xref is the classic hand-rolled-PDF failure.
  *
  * Scale discipline is [[Sinks.writeHtmlReport]]'s: each section is
  * capped (`limit(maxRows)` BEFORE the one presentation-layer collect),
  * numeric cells format through the same Indonesian-locale helpers, so
  * the PDF and HTML documents agree cell-for-cell. */
object Pdf {

  private val PageW = 595 // A4 portrait, points
  private val PageH = 842
  private val Margin = 40

  /** One laid-out text line: content, font size, bold, extra leading
    * ABOVE the line (section spacing). */
  private case class Line(text: String, size: Int, bold: Boolean,
      gapBefore: Int = 0)

  /** PDF string escape + Latin-1 clamp (the standard fonts' WinAnsi
    * covers Latin-1; anything outside degrades to '?' rather than
    * corrupting the stream). */
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '(' => "\\("
    case ')' => "\\)"
    case c if c >= 32 && c <= 126 => c.toString
    case c if c >= 0xA0 && c <= 0xFF => c.toString
    case _ => "?"
  }

  private def cellStr(v: Any): String = v match {
    case null => ""
    case d: Double => graft.functions.Format.numberStr(d, 2)
    case other => other.toString
  }

  /** Lay a DataFrame out as space-padded fixed-pitch rows: header,
    * dashed rule, then the capped data rows — pandas `to_string` shape,
    * which is what the reference's table sections are before Jinja. */
  private def tableLines(df: DataFrame, maxRows: Int): Seq[Line] = {
    val cols = df.columns.toSeq
    val rows = df.limit(maxRows).collect().toSeq
      .map(r => cols.indices.map(i => cellStr(r.get(i))))
    val widths = cols.indices.map(i =>
      (cols(i).length +: rows.map(_(i).length)).max)
    def pad(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("  ").stripTrailing()
    Line(pad(cols), 8, bold = true) +:
      Line(widths.map("-" * _).mkString("  "), 8, bold = false) +:
      rows.map(r => Line(pad(r), 8, bold = false))
  }

  /** Render the report and return its bytes; also writes `path` when
    * given. Sections and caps mirror [[Sinks.writeHtmlReport]]. */
  def writeReport(
      sections: Seq[(String, DataFrame)],
      title: String,
      runDate: String,
      path: Option[String] = None,
      maxRows: Int = 50): Array[Byte] = {
    val lines: Seq[Line] =
      Line(title, 14, bold = true) +:
        Line(s"Run date: $runDate", 10, bold = false, gapBefore = 4) +:
        sections.flatMap { case (name, df) =>
          Line(name, 11, bold = true, gapBefore = 14) +: tableLines(df, maxRows)
        }

    // paginate: leading = size + 4; break when the baseline would drop
    // into the bottom margin
    val pages = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[(Line, Int)]())
    var y = PageH - 50
    lines.foreach { ln =>
      val lead = ln.size + 4 + ln.gapBefore
      if (y - lead < Margin) {
        pages += scala.collection.mutable.ArrayBuffer[(Line, Int)]()
        y = PageH - 50
      }
      y -= lead
      pages.last += ((ln, y))
    }

    def contentStream(page: Seq[(Line, Int)]): String =
      page.map { case (ln, baseline) =>
        val font = if (ln.bold) "/F2" else "/F1"
        s"BT $font ${ln.size} Tf $Margin $baseline Td (${esc(ln.text)}) Tj ET"
      }.mkString("\n")

    // object graph: 1 catalog, 2 pages, 3 F1, 4 F2, then per page i:
    // page object (5+2i) + its content stream (6+2i)
    val nPages = pages.size
    val kids = (0 until nPages).map(i => s"${5 + 2 * i} 0 R").mkString(" ")
    val objs = scala.collection.mutable.ArrayBuffer(
      "<< /Type /Catalog /Pages 2 0 R >>",
      s"<< /Type /Pages /Kids [$kids] /Count $nPages >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Courier-Bold >>")
    pages.zipWithIndex.foreach { case (page, i) =>
      objs += (s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 $PageW $PageH] " +
        s"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> " +
        s"/Contents ${6 + 2 * i} 0 R >>")
      val cs = contentStream(page.toSeq)
      val len = cs.getBytes(StandardCharsets.ISO_8859_1).length
      objs += s"<< /Length $len >>\nstream\n$cs\nendstream"
    }

    val out = new ByteArrayOutputStream()
    def put(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    put("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.size()
      put(s"${i + 1} 0 obj\n$body\nendobj\n")
      off
    }
    val xrefOff = out.size()
    // each xref entry is EXACTLY 20 bytes (ISO 32000 §7.5.4)
    put(s"xref\n0 ${objs.size + 1}\n")
    put("0000000000 65535 f \n")
    offsets.foreach(off => put(f"$off%010d 00000 n \n"))
    put(s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")

    val bytes = out.toByteArray
    path.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), bytes))
    bytes
  }
}
