package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** xlsx shim: JDK-only ZIP+XML codec for the reference's real input
  * format (fianl2.py:133-135,212) — round-trip, shared-string and
  * sparse-cell decoding, and end-to-end workbook → summary. */
class XlsxSpec extends SparkSuite {

  private def tmpFile(name: String): String =
    new java.io.File(Files.createTempDirectory("xlsx").toFile, name).getAbsolutePath

  test("write → read round-trip: sheet order, strings, numbers, gaps") {
    val path = tmpFile("roundtrip.xlsx")
    val jan = Seq(
      Seq("Supply Type", "Net", "Tax"),
      Seq("Standard", "100.5", "5.025"),
      Seq("Zero, \"quoted\"", "45297", ""))
    val feb = Seq(Seq("only", "row"))
    Xlsx.write(path, Seq("Jan 2024" -> jan, "Feb 2024" -> feb))
    assert(Xlsx.sheetNames(path) == Seq("Jan 2024", "Feb 2024"))
    assert(Xlsx.readSheet(path, "Jan 2024") == jan)
    assert(Xlsx.readSheet(path, "Feb 2024") == feb)
    intercept[IllegalArgumentException](Xlsx.readSheet(path, "Mar 2024"))
  }

  test("shared strings, sparse cells, booleans decode like a real workbook") {
    // hand-built xlsx exercising the parts our writer does not emit:
    // a sharedStrings table (t="s"), skipped cells (B2 absent), booleans
    val path = tmpFile("sst.xlsx")
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(n: String, c: String): Unit = {
      zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="1" r:id="rId9"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId9" Type="t" Target="worksheets/data_part.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<si><t>Hello</t></si><si><r><t>Wor</t></r><r><t>ld</t></r></si></sst>""".stripMargin)
    put("xl/worksheets/data_part.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>42</v></c><c r="C2" t="b"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    // rich-text runs concatenate; the skipped B column back-fills ""
    assert(Xlsx.readSheet(path, "Data") == Seq(
      Seq("Hello", "", "World"),
      Seq("42", "", "TRUE")))
  }

  test("blank rows Excel omits from sheetData keep their grid position") {
    val path = tmpFile("sparse_rows.xlsx")
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(n: String, c: String): Unit = {
      zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>title</t></is></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>header</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    assert(Xlsx.readSheet(path, "S") == Seq(Seq("title"), Seq(""), Seq("header")))
  }

  test("multiline and quoted cells survive workbook → CSV → Spark ingest") {
    val path = tmpFile("multiline.xlsx")
    Xlsx.write(path, Seq("May 2024" -> Seq(
      Seq("Supply Type", "Invoice #", "Date", "Customer Name", "Net", "Tax", "Box"),
      Seq("Standard", "1", "2024-05-02", "ACME\nLLC, \"truly\"", "100", "5", "A"),
      Seq("Standard", "2", "2024-05-03", "Plain", "200", "10", "A"))))
    val res = new graft.api.VatPipeline(spark).processWorkbook(path)
    assert(res.failures.isEmpty)
    val rows = res.data.orderBy(col("invoice_number")).collect()
    assert(rows.length == 2, "embedded newline must not split the record")
    assert(rows(0).getAs[String]("customer_supplier_name") == "ACME\nLLC, \"truly\"")
    val byBox = res.summary.collect().map(r => r.getAs[String]("fta_box") -> r).toMap
    assert(byBox("Box A").getAs[Double]("net_value") == 300.0)
  }

  test("end-to-end: 2-sheet workbook → processWorkbook → golden-style summary") {
    val path = tmpFile("vat.xlsx")
    Xlsx.write(path, Seq(
      "Jan 2024" -> Seq(
        Seq("ACME LLC", "", "", "", "", ""),          // junk preamble
        Seq("Supply Type", "Invoice #", "Date", "Customer Name", "Net", "Tax", "Box"),
        Seq("Standard", "1", "2024-01-05", "Alpha", "AED 100", "5", "A"),
        Seq("Standard", "2", "45297", "Beta", "$100", "$5", "A"), // Excel serial date
        Seq("Input", "3", "2024-01-07", "Delta", "50", "2.5", "C")),
      "Feb 2024" -> Seq(
        Seq("Supply Type", "Invoice #", "Date", "Customer Name", "Net", "Tax", "Box"),
        Seq("Standard", "1", "2024-02-02", "Alpha", "200", "10", "A"))))
    val res = new graft.api.VatPipeline(spark).processWorkbook(path)
    assert(res.failures.isEmpty)
    val sum = res.summary.collect()
    assert(sum.length == 8) // 2 periods × 4 boxes
    val byKey = sum.map(r =>
      (r.getAs[String]("period"), r.getAs[String]("fta_box")) -> r).toMap
    // Jan box A: 100 + $100×3.67 = 467; vat 5 + 18.35
    assert(byKey(("Jan 2024", "Box A")).getAs[Double]("net_value") == 467.0)
    assert(byKey(("Jan 2024", "Box A")).getAs[Double]("vat_value") == 23.35)
    assert(byKey(("Jan 2024", "Box D")).getAs[Double]("net_vat_payable") == 20.85)
    assert(byKey(("Feb 2024", "Box A")).getAs[Double]("net_value") == 200.0)

    // and the summary writes back out as xlsx (the download sink)
    val out = tmpFile("summary.xlsx")
    res.writeXlsx(out)
    val back = Xlsx.readSheet(out, "VAT Summary")
    assert(back.head == Seq("period", "fta_box", "description",
      "net_value", "vat_value", "net_vat_payable"))
    assert(back.length == 9) // header + 8 rows

    // F12: the reference's timestamped filename (fianl2.py:248), clock pinned
    val clock = java.time.Clock.fixed(
      java.time.Instant.parse("2024-05-06T07:08:09Z"), java.time.ZoneOffset.UTC)
    assert(graft.api.Graft.timestampedName(clock = clock) ==
      "vat_summary_20240506_070809.xlsx")
    val tdir = Files.createTempDirectory("xlsx_ts").toFile.getAbsolutePath
    val tpath = res.writeXlsxTimestamped(tdir, clock)
    assert(tpath.endsWith("vat_summary_20240506_070809.xlsx"))
    assert(Xlsx.readSheet(tpath, "VAT Summary").length == 9)
  }
}
