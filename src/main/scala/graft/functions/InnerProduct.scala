package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: inner product (Σ aᵢ·bᵢ) of two DOUBLE
  * arrays — the MIPS scoring kernel (`CosineSimilarity`'s sibling, see
  * its scaladoc for why the HOF route is interpreted and this isn't).
  * The exact-MIPS arm (`simsearch_mips`) is a full corpus scan by
  * definition, so its per-element cost IS the query cost at 100 TB:
  * one multiply and one add on unboxed doubles inside whole-stage
  * codegen, no lambda dispatch, no per-row allocation.
  *
  * Accumulation is strictly left-to-right, matching `Similarity.dot`'s
  * HOF fold and the DuckDB oracle's `list_dot_product` — bit-identical
  * to both (differential-pinned in CosineSimilaritySpec). */
case class InnerProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "inner_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InnerProduct =
    copy(left = newLeft, right = newRight)
}

object InnerProduct {
  def inner_product(a: Column, b: Column): Column =
    ColumnBridge.column(InnerProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
