package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: slot j = min over the input string array of
  * murmur3(s, seed=j). One codegen'd loop over unsafe bytes replaces the
  * HOF formulation (K separate interpreted `aggregate` folds, each
  * re-dispatching a lambda per element with boxing). The K hash slots
  * share one pass over the array: O(elements × K) unboxed hash calls,
  * no allocation beyond the output array.
  *
  * Buffer semantics match ext.Dedup's LSH banding (element-wise min is
  * associative/commutative), so signatures are stable under any
  * partitioning; empty arrays yield Long.MaxValue slots, which never
  * collide into real LSH buckets together with non-empty docs only if
  * both are empty — exactly the degenerate-doc behavior the banding
  * expects.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 512, s"k must be in (0, 512], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = Murmur3_x86_32.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, j).toLong
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
      val murmur = classOf[Murmur3_x86_32].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $utf8 $s = $a.getUTF8String($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = (long) $murmur.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), $j);
         |      if ($h < $out[$j]) $out[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhash_sig(arr: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(arr), k))
}
