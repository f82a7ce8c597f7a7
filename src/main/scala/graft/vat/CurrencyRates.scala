package graft.vat

/** Constant lookup tables of the reference pipeline.
  *
  * Semantics source: /root/reference/fianl2.py:9-16 (CURRENCY_RATES — the
  * *insertion order* doubles as symbol-detection priority, fianl2.py:26-29)
  * and fianl2.py:43-48 (BOX_DESCRIPTIONS).
  *
  * These are tiny constant dimensions; in the engine they become either
  * literal `when`-cascades folded by Catalyst's ConstantFolding (currency
  * detection) or a broadcast-joined dimension DataFrame (box
  * descriptions) — never a shuffle.
  */
object CurrencyRates {
  /** Symbol → AED rate; order = detection priority (fianl2.py:9-16,26-29). */
  val ordered: Seq[(String, Double)] = Seq(
    "AED" -> 1.00, "د.إ" -> 1.00,
    "USD" -> 3.67, "$" -> 3.67,
    "EUR" -> 3.98, "€" -> 3.98,
    "GBP" -> 4.62, "£" -> 4.62,
    "SAR" -> 0.98, "ر.س" -> 0.98,
    "INR" -> 0.044, "₹" -> 0.044
  )

  val rates: Map[String, Double] = ordered.toMap

  /** FTA box descriptions (fianl2.py:43-48). */
  val boxDescriptions: Seq[(String, String)] = Seq(
    "Box A" -> "Standard Rated Supplies (5%)",
    "Box B" -> "Zero Rated Supplies (0%)",
    "Box C" -> "Recoverable Input VAT",
    "Box D" -> "Net VAT Payable (BoxA_VAT - BoxC_VAT)"
  )
}
