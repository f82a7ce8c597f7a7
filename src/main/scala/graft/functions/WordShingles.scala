package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram generation from a text column.
  *
  * With `distinct = true` the semantics are EXACTLY `array_distinct`
  * over space-joined n-grams of the non-empty space-split tokens (the
  * HOF formulation `Dedup.shinglesFromTokens(Dedup.tokens(text), n)`,
  * kept as the differential twin) — including first-occurrence distinct
  * order and the short-document empty-array guard. With
  * `distinct = false` it keeps every occurrence (term-frequency-aware
  * consumers: SimHash votes, repetition counting); n = 1 is plain
  * tokenization. The HOF tree walks interpreted lambdas per gram
  * element; this expression tokenizes and builds grams in a single
  * compiled pass, which was the dominant cost of every shingle-based
  * pipeline (MinHash, SimHash, contamination, Jaccard, repetition). */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleUtil$$.MODULE$$.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleUtil {
  /** Static helper the generated code calls — keeps the expression
    * inside the whole-stage-codegen span without inlining the loop. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val raw = text.toString.split(" ")
    val toks = new java.util.ArrayList[String](raw.length)
    var r = 0
    while (r < raw.length) { if (raw(r).nonEmpty) toks.add(raw(r)); r += 1 }
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val grams: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String]()
      else new java.util.ArrayList[String](m - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= m - n) {
      if (n == 1) grams.add(toks.get(i))
      else {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks.get(i + j)); j += 1 }
        grams.add(sb.toString)
      }
      i += 1
    }
    val out = new Array[Any](grams.size)
    val it = grams.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

object WordShingles {
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Non-distinct n-grams (term-frequency-aware); n = 1 = tokens. */
  def word_ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n, distinct = false))
}
