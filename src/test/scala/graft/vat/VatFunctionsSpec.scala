package graft.vat

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** F8 date parsing, F7 month detection, F4 box letter, S2 header
  * detection — reference-parity unit tests (fianl2.py:74-126). */
class VatFunctionsSpec extends SparkSuite {

  private def parse(values: Seq[String]): Seq[Option[Timestamp]] = {
    import spark.implicits._
    values.toDF("v").select(VatFunctions.parseDateMulti(col("v")).as("t"))
      .collect().map(r => Option(r.getTimestamp(0))).toSeq
  }

  test("excel serials: 1899-12-30 epoch, open interval (1, 60000)") {
    val got = parse(Seq("2", "45356", "59", "60000", "1", "0.5"))
    assert(got(0).contains(Timestamp.valueOf("1900-01-01 00:00:00")))
    assert(got(1).contains(Timestamp.valueOf("2024-03-05 00:00:00")))
    assert(got(2).contains(Timestamp.valueOf("1900-02-27 00:00:00")))
    assert(got(3).isEmpty) // 60000 excluded: falls through, no format matches
    assert(got(4).isEmpty) // 1 excluded (fianl2.py:108 strict inequality)
    assert(got(5).isEmpty) // 0.5 < 1 → int(0.5)=0 not serial; unparseable
  }

  test("day-first strings and ISO") {
    val got = parse(Seq("05/03/2024", "5-3-2024", "2024-03-05",
      "2024-03-05 13:45:00", "31/12/2023", "garbage", ""))
    assert(got(0).contains(Timestamp.valueOf("2024-03-05 00:00:00")))
    assert(got(1).contains(Timestamp.valueOf("2024-03-05 00:00:00")))
    assert(got(2).contains(Timestamp.valueOf("2024-03-05 00:00:00")))
    assert(got(3).contains(Timestamp.valueOf("2024-03-05 13:45:00")))
    assert(got(4).contains(Timestamp.valueOf("2023-12-31 00:00:00")))
    assert(got(5).isEmpty)
    assert(got(6).isEmpty)
  }

  test("fuzz: date parser is total (never throws) and serials round-trip") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val fuzz = Seq.fill(300) {
      rng.nextInt(5) match {
        case 0 => rng.nextInt(70000).toString
        case 1 => s"${rng.nextInt(40)}/${rng.nextInt(15)}/${1900 + rng.nextInt(200)}"
        case 2 => rng.alphanumeric.take(rng.nextInt(12)).mkString
        case 3 => s"${rng.nextInt(3000)}-${rng.nextInt(15)}-${rng.nextInt(35)}"
        case _ => ""
      }
    }
    // must not throw under ANSI mode; serial range must parse
    val out = fuzz.toDF("v")
      .select(VatFunctions.parseDateMulti(col("v")).as("t")).collect()
    assert(out.length == 300)
    val serials = fuzz.zip(out).collect {
      case (s, r) if s.matches("\\d+") && s.toInt > 1 && s.toInt < 60000 => r
    }
    assert(serials.nonEmpty && serials.forall(!_.isNullAt(0)),
      "all in-range Excel serials must parse")
  }

  test("month from sheet name (fianl2.py:89-100)") {
    assert(VatFunctions.extractMonthFromSheet("March 2024") == ("Mar", 3))
    assert(VatFunctions.extractMonthFromSheet("JAN") == ("Jan", 1))
    // "sep" precedes "sept" in scan order and is its substring → "Sep"
    assert(VatFunctions.extractMonthFromSheet("sept-2024") == ("Sep", 9))
    assert(VatFunctions.extractMonthFromSheet("sheet 03") == ("Mar", 3))
    assert(VatFunctions.extractMonthFromSheet("03") == ("Mar", 3))
    assert(VatFunctions.extractMonthFromSheet("13") == ("Unknown", 0))
    assert(VatFunctions.extractMonthFromSheet("random") == ("Unknown", 0))
    // reference quirk, reproduced: NFKD splits é → "e"+combining mark,
    // the mark becomes a space → "de cembre" contains no month token
    assert(VatFunctions.extractMonthFromSheet("décembre") == ("Unknown", 0))
    assert(VatFunctions.extractMonthFromSheet("December 2024") == ("Dec", 12))
  }

  test("box canonicalization and letter extraction") {
    import spark.implicits._
    val rows = Seq("Box A", "box b", " C ", "A", "D?", "??", null)
      .toDF("box")
      .select(VatFunctions.boxCanon(col("box")).as("canon"),
        VatFunctions.boxLetter(col("box")).as("letter"))
      .collect()
    assert(rows.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("B"), Some("B"), Some("C"), Some("A"), Some("D"), None, None))
    // first CAPITAL after upper(): "Box A" → upper → "BOX A" → 'B'
    assert(rows(0).getString(0) == "BOX A")
  }

  test("header-row detection: ≥2 keyword hits within first 30 rows") {
    val sheet = Seq(
      Seq("ACME LLC", "", ""),
      Seq("VAT report Q1", "", ""),
      Seq("Supply Type", "Date", "Net"),  // 3 hits → header
      Seq("Standard", "2024-01-05", "100"))
    assert(Conform.detectHeaderRow(sheet) == 2)
    // single hit rows never trigger; fallback 0
    assert(Conform.detectHeaderRow(Seq(Seq("date only"), Seq("x"))) == 0)
    // keyword counted once even if in many cells, needs two DISTINCT keywords
    assert(Conform.detectHeaderRow(Seq(Seq("date", "date", "date"))) == 0)
    assert(Conform.detectHeaderRow(Seq(Seq("date", "tax"))) == 0 + 0) // row 0
  }

  test("header normalization: NFKD, NBSP, trim (incl. ss2.png trailing-space evidence)") {
    assert(VatFunctions.normalizeHeader("Supply/Purchase Value ") == "Supply/Purchase Value")
    assert(VatFunctions.normalizeHeader("VAT Value") == "VAT Value")
    assert(VatFunctions.normalizeHeader(null) == "")
  }
}
