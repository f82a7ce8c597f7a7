package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct word n-gram shingling of a text column.
  *
  * Semantics are EXACTLY `array_distinct` over space-joined n-grams of
  * the non-empty space-split tokens (the HOF formulation
  * `Dedup.shinglesFromTokens(Dedup.tokens(text), n)`, kept as the
  * differential twin) — including first-occurrence distinct order and
  * the short-document empty-array guard. The HOF tree walks interpreted
  * lambdas per gram element; this expression tokenizes and builds grams
  * in a single compiled pass, which is the dominant cost of every
  * shingle-based pipeline (MinHash, contamination, Jaccard). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleUtil$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleUtil {
  /** Static helper the generated code calls — keeps the expression
    * inside the whole-stage-codegen span without inlining the loop. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val raw = text.toString.split(" ")
    val toks = new java.util.ArrayList[String](raw.length)
    var r = 0
    while (r < raw.length) { if (raw(r).nonEmpty) toks.add(raw(r)); r += 1 }
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks.get(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

object WordShingles {
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
