package graft.vat

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Golden-output replay (SURVEY.md §5.2-2): the full reference pipeline
  * over a synthesized workbook — junk preamble, synonym headers, messy
  * currencies, Excel-serial dates — must reproduce the reference's
  * summary shape and invariants (fianl2.py:167-195, vat_summary.db). */
class SummarySpec extends SparkSuite {

  private lazy val tmp = Files.createTempDirectory("vat_sheets").toFile

  private def writeSheet(name: String, lines: Seq[String]): String = {
    val f = new java.io.File(tmp, s"$name.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  // Jan sheet: junk preamble + synonym/trailing-space headers.
  // Box A: net 100 (AED) + 367 ($100) = 467; vat 5 + 18.35 ($5) = 23.35
  // Box C: net 50; vat 2.5        Box B: zero-rated net 200, vat 0
  private lazy val janPath = writeSheet("Jan 2024", Seq(
    "ACME LLC,,,,,",
    "VAT workbook,,,,,",
    "Supply Type,Invoice #,Date,Customer Name,Net,Tax",
    "Standard,1,2024-01-05,Alpha,AED 100,5",
    "Standard,2,05/01/2024,Beta,$100,$5",
    "Zero Rated,3,45297,Gamma,200,0",          // Excel serial 45297 = 2024-01-06
    "Input,4,2024-01-07,Delta,50,2.5"))

  // bare letters like the golden workbook: the reference's contains()
  // matching would put "Box X"-style values into box B via the B of "BOX"
  private lazy val boxedJan = Seq("A", "A", "B", "C")

  private def janConformed = {
    val df = Conform.processCsvSheet(spark, janPath, "Jan 2024")
    // the raw sheet has no Box column → inject per-row boxes for the test
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("invoice_number"))
    val boxes = typedlit(boxedJan)
    df.withColumn("box", element_at(boxes, row_number().over(w)))
      .withColumn("box_letter", VatFunctions.boxLetter(col("box")))
  }

  test("conformance: junk preamble skipped, synonyms renamed, money in AED") {
    val df = janConformed
    Conform.RequiredCols.foreach(c => assert(df.columns.contains(c), c))
    val rows = df.orderBy(col("invoice_number")).collect()
    assert(rows.length == 4)
    val nets = rows.map(_.getAs[Double]("net_value")).toSeq
    assert(nets == Seq(100.0, 367.0, 200.0, 50.0))
    val vats = rows.map(_.getAs[Double]("vat_value")).toSeq
    assert(vats == Seq(5.0, 18.35, 0.0, 2.5))
    // period detection: month from sheet name, year = mode of dates
    assert(rows.map(_.getAs[String]("month")).toSet == Set("Jan"))
    assert(rows.map(_.getAs[Int]("year")).toSet == Set(2024))
    // serial date parsed
    val d3 = df.filter(col("invoice_number") === "3")
      .select(VatFunctions.parseDateMulti(col("date"))).collect()(0).getTimestamp(0)
    assert(d3.toString.startsWith("2024-01-06"))
  }

  test("golden shape: 4 rows per period, D = A.vat − C.vat, zeros placement") {
    val summary = Summary.vatSummary(janConformed)
    val rows = summary.collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("fta_box")).toSeq ==
      Seq("Box A", "Box B", "Box C", "Box D"))
    val byBox = rows.map(r => r.getAs[String]("fta_box") -> r).toMap
    assert(byBox("Box A").getAs[Double]("net_value") == 467.0)
    assert(byBox("Box A").getAs[Double]("vat_value") == 23.35)
    assert(byBox("Box B").getAs[Double]("net_value") == 200.0)
    assert(byBox("Box C").getAs[Double]("vat_value") == 2.5)
    // D: net 0, vat = payable = A.vat − C.vat = 20.85 after round(2)
    // (fianl2.py:182,192-195; 23.35-2.5 in raw double is 20.85…0014)
    assert(byBox("Box D").getAs[Double]("net_value") == 0.0)
    assert(byBox("Box D").getAs[Double]("vat_value") == 20.85)
    assert(byBox("Box D").getAs[Double]("net_vat_payable") == 20.85)
    assert(byBox("Box A").getAs[Double]("net_vat_payable") == 0.0)
    // descriptions from the broadcast dimension (fianl2.py:43-48)
    assert(byBox("Box A").getAs[String]("description") == "Standard Rated Supplies (5%)")
    assert(byBox("Box D").getAs[String]("description") == "Net VAT Payable (BoxA_VAT - BoxC_VAT)")
    assert(summary.select("period").distinct().collect()(0).getString(0) == "Jan 2024")
  }

  test("invariant: summary row count = 4 × distinct periods (lineitem fixture)") {
    val s = Summary.lineitemVatSummary(spark, sfDir)
    val periods = s.select("year", "month_num").distinct().count()
    assert(s.count() == 4 * periods)
  }

  test("invariant: aggregate is stable under repartitioning") {
    val base = Summary.lineitemVatSummary(spark, sfDir).collect().toSeq
    val li = graft.core.Tables.lineitem(spark, sfDir).repartition(17)
    val tmpDir = Files.createTempDirectory("li_repart").toFile.getAbsolutePath
    li.write.mode("overwrite").parquet(s"$tmpDir/lineitem.parquet")
    // copy the other tables' paths is unnecessary: summary reads lineitem only
    val again = Summary.lineitemVatSummary(spark, tmpDir).collect().toSeq
    assert(base == again)
  }
}
