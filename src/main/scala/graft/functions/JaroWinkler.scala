package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as exact integer MICRO units (10⁶ = equal),
  * entirely in integer arithmetic so the score is engine- and
  * platform-deterministic (a float JW differs in last bits across
  * implementations, which flips threshold compares at scale):
  *
  *   jaro_micro = 10⁶ · (m²·l₂ + m²·l₁ + (m−t)·l₁·l₂) div (3·l₁·l₂·m)
  *   jw_micro   = jaro_micro + ℓ·(10⁶ − jaro_micro) div 10
  *
  * with m = Jaro matches (window ⌊max(l₁,l₂)/2⌋−1), t = ⌊half
  * transpositions⌋, ℓ = common prefix capped at 4 (Winkler's p = 0.1
  * folded into the div 10). Codepoint-indexed like the rest of the
  * text stack. Empty-vs-empty scores 10⁶ (equal); empty-vs-nonempty 0.
  *
  * The fuzzy-match second metric beside `Dedup.editDistancePairs`'
  * banded Levenshtein: edit distance counts operations, JW rewards
  * shared prefixes — the name-matching literature's default
  * (Winkler 1990). Codegen emits ONE static call (the pattern Spark's
  * own `levenshtein` uses) — no boxing, no row allocation.
  */
case class JaroWinklerMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, STRING), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_micro"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerMicro.jwMicro(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerMicro.jwMicro($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerMicro =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerMicro {

  /** Static kernel shared by interpreted eval and generated code. */
  def jwMicro(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1000000L
    if (l1 == 0 || l2 == 0) return 0L
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val ma = new Array[Boolean](l1)
    val mb = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // half transpositions: matched characters out of relative order
    var half = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a(i) != b(j)) half += 1
        j += 1
      }
      i += 1
    }
    val t = half / 2
    val mm = m.toLong
    // num ≤ 3·l³ and the scaled numerator is num·10⁶, which exceeds
    // Long once max(l1,l2) ≳ 14.5k codepoints — the expression is a
    // general SQL function, so document-length inputs are legal. Route
    // long inputs through BigInt; the common (name-length) path stays
    // allocation-free Long arithmetic.
    val jaro: Long =
      if (math.max(l1, l2) > 14000) {
        val num = BigInt(mm) * mm * l2 + BigInt(mm) * mm * l1 +
          BigInt(mm - t) * l1 * l2
        (num * 1000000 / (BigInt(3) * l1 * l2 * mm)).toLong
      } else {
        val num = mm * mm * l2 + mm * mm * l1 + (mm - t) * l1 * l2
        num * 1000000L / (3L * l1 * l2 * mm)
      }
    var prefix = 0
    while (prefix < math.min(4, math.min(l1, l2)) &&
      a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * (1000000L - jaro) / 10L
  }

  def jaro_winkler_micro(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerMicro(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
