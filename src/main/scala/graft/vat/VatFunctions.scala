package graft.vat

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's row-level "UDFs" re-expressed as pure Column chains so
  * they stay inside whole-stage codegen (SURVEY.md §2.8, §4.1). No Scala
  * closures / `udf()` in the hot path — Catalyst folds the constant
  * cascades and the parquet reader feeds them vectorized.
  */
object VatFunctions {

  /** F1 — currency detect + convert to AED (fianl2.py:18-40).
    *
    * Parity-pinned semantics:
    *  - null → 0.0
    *  - symbol detection scans `CurrencyRates.ordered` in priority order,
    *    first `contains` hit wins (fianl2.py:26-29); no hit → rate 1.0
    *  - strip everything but `[0-9.()-]` (fianl2.py:31)
    *  - `(123)` accounting negative → `-123` (fianl2.py:32-33)
    *  - unparseable → 0.0 (fianl2.py:35-38); Python float() grammar is
    *    pinned by an rlike guard (also keeps ANSI-mode cast from throwing)
    *  - round(×rate, 2) with Python's banker's rounding → `bround`
    *    (fianl2.py:40)
    */
  def currencyToAed(c: Column): Column = {
    val s = trim(c.cast("string"))
    val rateC = CurrencyRates.ordered.reverse.foldLeft(lit(1.0)) {
      case (acc, (sym, r)) => when(s.contains(sym), lit(r)).otherwise(acc)
    }
    val cleaned = regexp_replace(s, "[^0-9.()\\-]", "")
    val unparen = when(
      cleaned.startsWith("(") && cleaned.endsWith(")") && length(cleaned) >= 2,
      concat(lit("-"), cleaned.substr(lit(2), length(cleaned) - 2))
    ).otherwise(cleaned)
    // Python float() accepts: optional sign, digits with at most one dot,
    // at least one digit ("5", "5.", ".5", "-5.0"). Anything else → 0.0.
    val num = when(unparen.rlike("^-?(\\d+\\.?\\d*|\\.\\d+)$"),
      unparen.cast("double")).otherwise(lit(0.0))
    when(c.isNull, lit(0.0)).otherwise(bround(num * rateC, 2))
  }

  /** F8 — multi-format date parse (fianl2.py:102-113).
    *
    * Order: numeric Excel serial in (1, 60000) → 1899-12-30 + int(v) days;
    * else day-first string formats, then ISO. `dayfirst=True` in pandas is
    * a preference, not a guarantee — we pin an explicit format list
    * (documented deviation, SURVEY.md §7.4).
    */
  def parseDateMulti(c: Column): Column = {
    val s = trim(c.cast("string"))
    val d = when(s.rlike("^-?\\d+(\\.\\d+)?$"), s.cast("double"))
    val isSerial = d.isNotNull && d > 1 && d < 60000
    // 1899-12-30T00:00:00Z epoch seconds = -2209161600
    val serialTs = timestamp_seconds(lit(-2209161600L) + d.cast("int") * 86400L)
    val parsed = coalesce(
      try_to_timestamp(s, lit("d/M/yyyy H:mm:ss")),
      try_to_timestamp(s, lit("d/M/yyyy H:mm")),
      try_to_timestamp(s, lit("d/M/yyyy")),
      try_to_timestamp(s, lit("d-M-yyyy")),
      try_to_timestamp(s, lit("d.M.yyyy")),
      try_to_timestamp(s, lit("yyyy-M-d H:mm:ss")),
      try_to_timestamp(s, lit("yyyy-M-d")),
      try_to_timestamp(s, lit("MMM d yyyy")),
      try_to_timestamp(s, lit("d MMM yyyy"))
    )
    when(c.isNull, lit(null).cast("timestamp"))
      .when(isSerial, serialTs)
      .otherwise(parsed)
  }

  /** F4 + F3 — box canonicalization: upper+trim (fianl2.py:162). By
    * default the pandas `astype(str)` null→"nan" quirk is NOT reproduced
    * (nulls stay null, so null-box rows fall outside every box;
    * SURVEY.md §7.4). With `nanCompat = true` the quirk is replayed
    * bit-for-bit: a null cell becomes the literal "NAN", whose contains
    * matching then lands the row in Box A and whose first capital is "N"
    * (fianl2.py:162-163, 176) — for users who need old-workbook totals
    * to reproduce exactly on dirty data. */
  def boxCanon(c: Column, nanCompat: Boolean = false): Column = {
    val s = c.cast("string")
    upper(trim(if (nanCompat) coalesce(s, lit("nan")) else s))
  }

  /** First capital letter (fianl2.py:163); pandas yields NaN on no-match,
    * Spark `regexp_extract` yields "" — wrap with nullif for parity. */
  def boxLetter(c: Column): Column =
    nullif(regexp_extract(boxCanon(c), "([A-Z])", 1), lit(""))

  /** English month abbreviation from month number (1-12), 0/invalid → null. */
  def monthAbbrev(m: Column): Column = element_at(
    typedlit(Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")),
    when(m.between(1, 12), m).otherwise(lit(null)))

  // ----- driver-side (metadata) functions -------------------------------

  /** F2 — header normalize: NFKD, NBSP→space, trim (fianl2.py:67-72).
    * Runs on schema metadata (driver side), not on data. */
  def normalizeHeader(h: String): String = {
    if (h == null) ""
    else Normalizer.normalize(h, Normalizer.Form.NFKD)
      .replace('\u00A0', ' ').trim
  }

  private val MonthsMap: Seq[(String, Int)] = Seq(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "sept" -> 9, "oct" -> 10,
    "nov" -> 11, "dec" -> 12)

  private val MonthNames = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  /** F7 — month from sheet name (fianl2.py:89-100). Token scan in map
    * order, then bare-number fallback `\b(0?[1-9]|1[0-2])\b`; miss →
    * ("Unknown", 0). NOTE: the map's "sept" key is unreachable for
    * labeling — "sep" precedes it in iteration order and is a substring
    * of any text containing "sept", so both return ("Sep", 9), exactly
    * like the reference's dict scan. */
  def extractMonthFromSheet(sheetName: String): (String, Int) = {
    val s0 = Normalizer.normalize(String.valueOf(sheetName), Normalizer.Form.NFKD)
    val s = s0.replaceAll("[^a-zA-Z0-9]", " ").toLowerCase
    MonthsMap.find { case (name, _) => s.contains(name) } match {
      case Some((name, num)) => (name.capitalize, num)
      case None =>
        val m = "\\b(0?[1-9]|1[0-2])\\b".r.findFirstMatchIn(s)
        m match {
          case Some(hit) =>
            val num = hit.group(1).toInt
            (MonthNames(num - 1), num)
          case None => ("Unknown", 0)
        }
    }
  }
}
