package graft.vat

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

import graft.SparkSuite

/** F1 parity: the engine's Column-chain currency conversion vs an
  * independent Scala replica of the reference semantics
  * (fianl2.py:18-40). The replica parses with Java's Double.parseDouble
  * (same accepted grammar as Python float() over the cleaned charset)
  * and rounds half-even like Python round() — deliberately NOT the same
  * code path as the engine, so this is a true differential test. */
class CurrencySpec extends SparkSuite {

  private def refCurrency(value: String): Double = {
    if (value == null) return 0.0
    val text = value.trim
    val rate = CurrencyRates.ordered
      .find { case (sym, _) => text.contains(sym) }
      .map(_._2).getOrElse(1.0)
    var clean = text.replaceAll("[^0-9.()\\-]", "")
    if (clean.startsWith("(") && clean.endsWith(")") && clean.length >= 2)
      clean = "-" + clean.substring(1, clean.length - 1)
    val num = try clean.toDouble catch { case _: NumberFormatException => 0.0 }
    BigDecimal(num * rate).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
  }

  private def engine(values: Seq[String]): Seq[Double] = {
    import spark.implicits._
    values.toDF("v").select(VatFunctions.currencyToAed(col("v")).as("out"))
      .collect().map(_.getDouble(0)).toSeq
  }

  private val pinned = Seq(
    "1234.50", "1,234.50", "AED 1 200", "$ 99.99", "$99", "USD 3", "€1.50",
    "EUR 2,000.10", "£7", "GBP 12.00", "ر.س 40", "SAR 41", "₹100", "INR 55",
    "د.إ 75", "(500)", "AED (1,250.75)", "$(42)", "--", "-", "", "   ",
    "abc", "1.2.3", "()", "(5", "5)", "5.", ".5", "-.5", "-5.", "12-34",
    "AED$50",       // both symbols: AED wins (dict order priority)
    "$AED50",       // still AED (scan order, not first-in-string)
    "₹(2,000)", "0", "-0", "(0)", "99999999.99", "(.5)", "(-5)")

  test("pinned reference cases match") {
    val got = engine(pinned)
    pinned.zip(got).foreach { case (in, out) =>
      assert(out == refCurrency(in), s"input '$in'")
    }
  }

  test("null maps to 0.0") {
    import spark.implicits._
    val out = Seq[Option[String]](None).toDF("v")
      .select(VatFunctions.currencyToAed(col("v"))).collect()(0).getDouble(0)
    assert(out == 0.0)
  }

  test("property: engine == reference replica on random currency-ish strings") {
    val sym = Gen.oneOf("AED", "$", "€", "£", "ر.س", "₹", "د.إ", "USD", "", " ")
    val body = Gen.listOf(Gen.oneOf("0", "1", "9", ".", ",", "-", "(", ")", " ", "5"))
      .map(_.mkString)
    val g = for { s <- sym; b <- body; tail <- sym } yield s + b + tail
    val cases = Gen.listOfN(300, g).sample.getOrElse(Seq.empty)
    val got = engine(cases)
    cases.zip(got).foreach { case (in, out) =>
      assert(out == refCurrency(in), s"input '$in'")
    }
  }

  test("scale equivariance: parseable numerics scale with the rate") {
    val got = engine(Seq("$100", "100", "£100", "€100", "AED 100", "₹100", "SAR 100"))
    assert(got == Seq(367.0, 100.0, 462.0, 398.0, 100.0, 4.4, 98.0))
  }
}
