package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native winnowing selection (Schleimer et al. SIGMOD'03): given the
  * rolling k-gram hash array, return the DISTINCT 1-based positions
  * selected by sliding-window minimum over every w-window, leftmost on
  * ties — the classic monotonic-deque algorithm, O(n) amortized.
  *
  * The HOF formulation (transform over window starts, slice + array_min
  * + array_position per start) is O(n·w) with an interpreted lambda
  * dispatch per element — measured ~6× the whole-query cost at sf0.1.
  * This expression replaces it with one unboxed pass: each index enters
  * and leaves the deque at most once.
  *
  * Tie semantics match the declared oracle exactly: the deque pops
  * strictly-greater values only, so an EARLIER equal hash survives
  * behind a later one and the window front is the leftmost minimum —
  * the same position `list_position(list_slice(...), list_min(...))`
  * yields in SQL. Fewer than w hashes → empty output (no window fits).
  */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1 && w <= 4096, s"window w must be in [1, 4096], got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - w + 1
    if (m <= 0) new GenericArrayData(Array.empty[Int])
    else {
      val deque = new Array[Int](n)
      var head = 0; var tail = 0
      val out = new Array[Int](m)
      var cnt = 0; var last = -1
      var j = 0
      while (j < n) {
        val hj = arr.getLong(j)
        while (tail > head && arr.getLong(deque(tail - 1)) > hj) tail -= 1
        deque(tail) = j; tail += 1
        val s = j - w + 1
        if (s >= 0) {
          while (deque(head) < s) head += 1
          val p = deque(head)
          if (p != last) { out(cnt) = p + 1; cnt += 1; last = p }
        }
        j += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val deque = ctx.freshName("deque")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val out = ctx.freshName("out")
      val cnt = ctx.freshName("cnt")
      val last = ctx.freshName("last")
      val j = ctx.freshName("j")
      val hj = ctx.freshName("hj")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |int $m = $n - $w + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new $gad(new int[0]);
         |} else {
         |  int[] $deque = new int[$n];
         |  int $head = 0; int $tail = 0;
         |  int[] $out = new int[$m];
         |  int $cnt = 0; int $last = -1;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $hj = $a.getLong($j);
         |    while ($tail > $head && $a.getLong($deque[$tail - 1]) > $hj) $tail--;
         |    $deque[$tail++] = $j;
         |    int $s = $j - $w + 1;
         |    if ($s >= 0) {
         |      while ($deque[$head] < $s) $head++;
         |      int $p = $deque[$head];
         |      if ($p != $last) { $out[$cnt++] = $p + 1; $last = $p; }
         |    }
         |  }
         |  ${ev.value} = new $gad(java.util.Arrays.copyOf($out, $cnt));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  def winnow_select(hashes: Column, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(hashes), w))
}
