package graft

import java.nio.charset.StandardCharsets

import graft.sources.Pdf

/** S9 PDF — the stdlib PDF writer must produce a STRUCTURALLY valid
  * file (header, object graph, byte-exact xref, trailer) whose content
  * streams carry the same report text as the HTML document. The xref
  * check is the load-bearing one: every entry must point at its
  * `N 0 obj` header byte, which is exactly what a conforming reader
  * seeks on. */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(b: Array[Byte]): String =
    new String(b, StandardCharsets.ISO_8859_1)

  /** All literal strings shown by Tj operators, unescaped. */
  private def shownText(pdf: String): Seq[String] =
    """\((?:[^()\\]|\\.)*\) Tj""".r.findAllIn(pdf).toSeq
      .map(m => m.stripSuffix(") Tj").stripPrefix("(")
        .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\"))

  test("PDF report: valid header, xref offsets, trailer, shared text") {
    val df = Seq(("Monday", 42L, 1234567.891), ("Tuesday", 7L, 2.5))
      .toDF("day_name", "n", "value")
    val out = java.nio.file.Files.createTempDirectory("graft_pdf")
      .resolve("report.pdf").toString
    val bytes = Pdf.writeReport(Seq("Peak Day of Week" -> df),
      "Warehouse Report", "2002-01-01 00:00:00", Some(out))
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)).sameElements(bytes))
    val s = ascii(bytes)
    assert(s.startsWith("%PDF-1.4\n"))
    assert(s.endsWith("%%EOF\n"))

    // startxref points at the xref table
    val startxref = """startxref\n(\d+)\n%%EOF\n$""".r
      .findFirstMatchIn(s).get.group(1).toInt
    assert(s.substring(startxref).startsWith("xref\n"), "bad startxref")
    // every xref entry's offset lands exactly on its object header
    val entries = """(\d{10}) 00000 n """.r.findAllMatchIn(s).toSeq
      .map(_.group(1).toInt)
    assert(entries.nonEmpty)
    entries.zipWithIndex.foreach { case (off, i) =>
      assert(s.substring(off).startsWith(s"${i + 1} 0 obj"),
        s"xref entry ${i + 1} -> $off does not hit its object")
    }
    // trailer size = objects + the free entry
    assert(s.contains(s"/Size ${entries.size + 1}"))

    // content: title, run date, section, header, cells — and doubles go
    // through the same locale filter as the HTML document
    val text = shownText(s).mkString("\n")
    assert(text.contains("Warehouse Report"))
    assert(text.contains("Run date: 2002-01-01 00:00:00"))
    assert(text.contains("Peak Day of Week"))
    assert(text.contains("day_name"))
    assert(text.contains("Monday") && text.contains("Tuesday"))
    assert(text.contains("1.234.567,89"), text)
  }

  test("PDF report: long tables paginate; parens and caps handled") {
    val big = (1 to 200).map(i => (s"row($i)", i.toDouble))
      .toDF("name", "value")
    val s = ascii(Pdf.writeReport(Seq("Big" -> big), "T", "2002-01-01",
      None, maxRows = 200))
    val nPages = """/Type /Page[^s]""".r.findAllIn(s).size
    assert(nPages >= 2, s"expected pagination, got $nPages page(s)")
    assert(s.contains(s"/Count $nPages"))
    // every page object has a resolvable content stream
    assert("""/Contents \d+ 0 R""".r.findAllIn(s).size == nPages)
    // parens escaped in the stream, restored on extraction
    assert(shownText(s).exists(_.contains("row(1)")))
    // maxRows cap: 10-row cap drops row 11
    val capped = ascii(Pdf.writeReport(Seq("Big" -> big), "T",
      "2002-01-01", None, maxRows = 10))
    assert(!shownText(capped).exists(_.contains("row(11)")))
  }

  test("Pipeline.pdfReport renders the five sections from written reports") {
    val out = java.nio.file.Files.createTempDirectory("graft-pdfrep").toString
    Pipeline.run(spark, "/root/testdata/sf0.001", out)
    val pdf = ascii(Pipeline.pdfReport(spark, out, "2002-01-01 00:00:00",
      Some(s"$out/warehouse_report.pdf")))
    val text = shownText(pdf).mkString("\n")
    for (sec <- Seq("Inventory Summary", "Financial Summary",
        "Peak Day of Week", "Peak Month", "Transfer Patterns (top 10)"))
      assert(text.contains(sec), s"missing section $sec")
    // same weekday content as the HTML document's section
    assert(text.contains("Monday") && text.contains("Sunday"))
    assert(new java.io.File(s"$out/warehouse_report.pdf").length() > 0)
  }
}
