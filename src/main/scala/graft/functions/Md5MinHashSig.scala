package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over the PORTABLE md5 hash family: slot j =
  * min over the input string array of the first 15 md5 hex chars of
  * "j:s" read as a 60-bit integer — bit-identical to the interpreted
  * Column chain `conv(substring(md5(concat("j:", s)), 1, 15), 16, 10)
  * .cast(long)` that the DuckDB oracle replays (`Dedup.md5MinhashSql`),
  * but compiled to one codegen'd loop with an amortized `MessageDigest`
  * per thread instead of K interpreted `aggregate` folds that allocate
  * a hex string and a conv parse per (element, slot).
  *
  * Null semantics mirror the HOF exactly: an EMPTY array yields a NULL
  * signature (the md5 chain's `when(size = 0, null)` guard); null
  * ELEMENTS are skipped (`least(acc, null)` keeps acc), so an all-null
  * array degenerates to Long.MaxValue slots. Pinned differentially in
  * Md5MinHashSigSpec.
  *
  * The murmur3 `MinHashSig` stays the fastest family; this one is for
  * the oracle-replayable chains, which at 100 TB are the same
  * signatures a second engine (or a later audit) must be able to
  * recompute.
  */
case class Md5MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 512, s"k must be in (0, 512], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "md5_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = Md5MinHashSig.hashSlot(j, s)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val helper = "graft.functions.Md5MinHashSig"
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $utf8 $s = $a.getUTF8String($i);
         |      for (int $j = 0; $j < $k; $j++) {
         |        long $h = $helper.hashSlot($j, $s);
         |        if ($h < $out[$j]) $out[$j] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSig =
    copy(child = newChild)
}

object Md5MinHashSig {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val prefixes =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Byte]]()

  /** First 15 md5 hex chars of "seed:s" as a 60-bit long — the exact
    * value `('0x' || substr(md5(seed || ':' || s), 1, 15))::BIGINT`
    * produces in DuckDB. Static so generated code can call it directly.
    * 15 hex chars = bytes 0..6 plus the high nibble of byte 7. */
  def hashSlot(seed: Int, s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    md.update(prefixes.computeIfAbsent(seed, k => s"$k:".getBytes("UTF-8")))
    md.update(s.getBytes)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }

  def md5_minhash_sig(arr: Column, k: Int): Column =
    ColumnBridge.column(Md5MinHashSig(ColumnBridge.expression(arr), k))
}
