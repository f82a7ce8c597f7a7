package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantics + plan shape for the correlated-subquery family.
  *
  * The q21 fixture pins every branch of the EXISTS / NOT EXISTS pair:
  * sole-late counts, all-late cancels, single-supplier orders and
  * non-'F' orders are out, and a supplier's own second late line is not
  * "another supplier". The plan tests pin the two scale claims made in
  * SubqueryShapes' scaladoc: the window rides the join's order-key
  * shuffle, and NOT IN costs zero shuffles.
  */
class SubqueryShapesSpec extends SparkSuite {

  test("sole-late-shipper: quantifier branches on a crafted fixture") {
    import spark.implicits._
    val orders = Seq(
      (1L, "F", "2020-01-01"), (2L, "F", "2020-01-01"),
      (3L, "F", "2020-01-01"), (4L, "O", "2020-01-01"),
      (5L, "F", "2020-01-01"))
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val lineitem = Seq(
      (1L, 101L, "2020-06-01"), (1L, 102L, "2020-01-15"), // sole late → counts
      (2L, 101L, "2020-06-01"), (2L, 102L, "2020-07-01"), // both late → nobody
      (3L, 101L, "2020-06-01"),                           // no other supplier
      (4L, 101L, "2020-06-01"),                           // order not 'F'
      (5L, 101L, "2020-06-01"), (5L, 101L, "2020-08-01"), // own 2nd late line is
      (5L, 102L, "2020-01-10"))                           //   not "another supplier"
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supplier = Seq((101L, "S101"), (102L, "S102")).toDF("s_suppkey", "s_name")

    val out = SubqueryShapes
      .soleLateShippers(lineitem, orders, supplier, lagDays = 60)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("S101", 3L)))
  }

  test("q21 window reuses the order-key join shuffle (no extra Exchange)") {
    val p = graft.SparkEntry.queries("q21_sole_late_shipper")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"expected a window rewrite:\n$p")
    val orderKeyShuffles =
      "hashpartitioning\\(l_orderkey".r.findAllIn(p).length
    assert(orderKeyShuffles <= 2, // join inputs only; 3 would mean the
      s"window re-shuffled on l_orderkey:\n$p") // window paid its own
  }

  test("q16 NOT IN plans as a broadcast anti join — zero-shuffle quantifier") {
    val p = graft.SparkEntry.queries("q16_supplier_variety")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"expected broadcast left-anti:\n$p")
  }

  test("NOT IN with a NULL in the exclusion list: empty result, null-aware plan") {
    val df = graft.SparkEntry.queries("notin_null_semantics")(spark, sfDir)
    val out = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one NULL in the list ⇒ the predicate is never TRUE ⇒ zero rows
    assert(out("raw_not_in") == 0L, out)
    // the IS NOT NULL guard restores the intended complement — exactly
    // the table minus the excluded suppliers' lines, cross-checked via
    // an independent semi-join count
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val excludedLines = li.join(
      graft.core.Tables.supplier(spark, sfDir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey")),
      col("l_suppkey") === col("s_suppkey"), "left_semi").count()
    assert(out("null_guarded") > 0L &&
      out("null_guarded") == li.count() - excludedLines, out)
    // Catalyst must keep ANSI semantics via a null-aware anti join on
    // the raw variant — the `= OR isnull(=)` condition — not silently
    // degrade to a plain anti join (AQE then folds the provably-empty
    // side to an EmptyRelation, which is the point: the semantics are
    // decided in the join condition, visible either way)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti") &&
      (p.contains("OR isnull") || p.contains("NAAJ")),
      s"expected a null-aware anti join condition:\n$p")
  }

  test("q7 nation-set pairing never degenerates to a cartesian; dims broadcast") {
    val p = graft.SparkEntry.queries("q7_nation_volume")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && p.contains("BroadcastHashJoin"))
  }

  test("q8 market share: numerator never exceeds denominator, share in [0,1]") {
    val rows = graft.SparkEntry.queries("q8_market_share")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Double]("nation_volume") <= r.getAs[Double]("total_volume"))
    }
  }
}
