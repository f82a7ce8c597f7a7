package graft.rel

import graft.SparkSuite

/** Pair association rules (rel/Baskets): hand-computed support /
  * confidence / lift, directionality, and the dedup of repeated lines. */
class BasketsSpec extends SparkSuite {
  import spark.implicits._

  test("support, confidence, lift match hand computation") {
    // baskets: 1={A,B,C} 2={A,B} 3={A,B} 4={C}; a repeated (1,A) line
    // must not inflate support
    val li = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val got = Baskets.pairRules(Baskets.baskets(li), minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // only {10,20} co-occur >= 2 times (3 baskets); N=4, supp(10)=supp(20)=3
    assert(got.toSeq === Seq(
      (10L, 20L, 3L, 1.0, 4.0 * 3 / 9),
      (20L, 10L, 3L, 1.0, 4.0 * 3 / 9)))
  }

  test("fixture-wide invariants: bounds, symmetry of pair support") {
    val rules = Baskets.pairRules(
      Baskets.baskets(spark.read.parquet(s"$sfDir/lineitem.parquet")),
      minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rules.nonEmpty)
    // confidence is a probability; lift positive; support ≥ threshold
    assert(rules.forall { case (_, _, n, c, l) =>
      n >= 2 && c > 0.0 && c <= 1.0 && l > 0.0 })
    // pair support is symmetric: n_ab(a→b) == n_ab(b→a), both present
    val supp = rules.map { case (a, b, n, _, _) => (a, b) -> n }.toMap
    assert(supp.forall { case ((a, b), n) => supp.get((b, a)).contains(n) })
  }

  test("confidence is directional when supports differ") {
    // baskets: 1={A,B} 2={A,B} 3={A}; A→B confidence 2/3, B→A confidence 1
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val got = Baskets.pairRules(Baskets.baskets(li), minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 2L, 2.0 / 3), (2L, 1L, 1.0)))
  }
}
