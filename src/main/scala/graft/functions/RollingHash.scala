package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp polynomial rolling hash over every k-gram of a string:
  * position i (1-based, codepoint-indexed) hashes to
  *
  *   H_i = ( Σ_{j=0..k-1} cp(t[i+j]) · B^(k-1-j) ) mod M
  *
  * with B = 1000003 and M = 2^31 − 1 (Mersenne), returned as
  * ARRAY<BIGINT> of length n−k+1 (empty when n < k).
  *
  * This is the O(n) replacement for the per-position
  * `conv(substring(md5(substr(t,i,k)),1,8),16,10)` chain that fed the
  * winnowing fingerprints: one md5 PER CHARACTER of every document
  * (plus a hex round-trip through three string allocations each)
  * dominated `text_winnow`/`dedup_winnow` end to end. Here each
  * position is one subtract-multiply-add in modular integer
  * arithmetic — no allocation, fully codegen'd.
  *
  * Cross-engine portability (the DuckDB oracle gate): every operation
  * is exact BIGINT arithmetic, and the codepoint of the character at a
  * 1-based character index is the same quantity as DuckDB's
  * `ascii(substr(t, i, 1))`, so the oracle can state the SAME sum with
  * B^j mod M folded in as literals — see `sqlKgramHashes` below, which
  * generates that SQL so engine and oracle share one source of truth.
  * All intermediates stay < 2^52 (cp < 2^21, B < 2^20, partial sums
  * < 2^32), far inside both engines' exact BIGINT range.
  *
  * For winnowing, hash QUALITY only affects fingerprint selection
  * (collisions merely merge windows); the polynomial family is the
  * standard choice in the MOSS/winnowing literature (Schleimer et al.
  * SIGMOD'03 §2 use Karp–Rabin hashes for exactly this reason).
  */
case class RollingHash(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 256, s"gram size k must be in [1, 256], got $k")

  import RollingHash.{B, M}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_hash"

  // B^(k-1) mod M — the leading-codepoint weight removed on each slide
  private lazy val pre: Long = RollingHash.powMod(k - 1)

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val m = n - k + 1
    if (m <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](m)
      var h = 0L
      var j = 0
      while (j < k) { h = (h * B + cps(j)) % M; j += 1 }
      out(0) = h
      var i = 0
      while (i < m - 1) {
        h = (((h + M - (cps(i) * pre) % M) % M) * B + cps(i + k)) % M
        i += 1
        out(i) = h
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cps = ctx.freshName("cps")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int[] $cps = $a.toString().codePoints().toArray();
         |int $n = $cps.length;
         |int $m = $n - $k + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new $gad(new long[0]);
         |} else {
         |  long[] $out = new long[$m];
         |  long $h = 0L;
         |  for (int $j = 0; $j < $k; $j++) $h = ($h * ${B}L + $cps[$j]) % ${M}L;
         |  $out[0] = $h;
         |  for (int $i = 0; $i < $m - 1; $i++) {
         |    $h = ((($h + ${M}L - ($cps[$i] * ${pre}L) % ${M}L) % ${M}L) * ${B}L
         |          + $cps[$i + $k]) % ${M}L;
         |    $out[$i + 1] = $h;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Polynomial base and Mersenne modulus — shared by the expression
    * and the generated oracle SQL. */
  val B: Long = 1000003L
  val M: Long = 2147483647L

  def powMod(e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = (r * B) % M; i += 1 }
    r
  }

  def rolling_hash(text: Column, k: Int): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(text), k))

  /** The oracle side: DuckDB SQL computing the identical k-gram hash
    * array for a string expression `t` — the direct (non-rolling) sum
    * with the B^j mod M weights folded in as literals. O(n·k) is fine
    * at oracle scale; bit-equality with the rolling form is exact
    * modular arithmetic, pinned by RollingHashSpec. */
  def sqlKgramHashes(t: String, k: Int): String = {
    val weights = (0 until k)
      .map(j => s"CAST(ascii(substr($t, CAST(i + $j AS INT), 1)) AS BIGINT)" +
        s" * ${powMod(k - 1 - j)}")
      .mkString(" + ")
    s"""CASE WHEN length($t) >= $k THEN
       |  list_transform(range(1, length($t) - ${k - 2}),
       |    i -> ($weights) % $M)
       |ELSE [] END""".stripMargin
  }
}
