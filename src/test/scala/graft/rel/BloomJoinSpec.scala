package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Exact

/** Bloom-prefiltered join (rel/AdvancedJoins.bloomPrefilteredJoin):
  * the rewrite must be invisible — false positives die in the exact
  * join, false negatives are impossible (a present key's bits are set
  * by construction) — and the prefilter must actually cut the probe. */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  test("rewrite is semantics-preserving: bit-equal to the plain join") {
    val l = graft.core.Tables.lineitem(spark, sfDir)
    val s = graft.core.Tables.supplier(spark, sfDir)
    val got = AdvancedJoins.bloomPrefilteredJoin(l, s)
      .collect().map(_.toSeq).toSeq
    val plain = l.join(s.filter(col("s_acctbal") > 5000),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(Exact.money(col("l_extendedprice")) *
          Exact.oneMinus(col("l_discount")))
          .cast("decimal(38,2)") * 100).cast("long").as("revenue_cents"))
      .orderBy(col("s_name"))
      .collect().map(_.toSeq).toSeq
    assert(got === plain)
  }

  test("no false negatives on a hand dim; non-members mostly pruned") {
    // dim keys {1, 2}; probe carries keys 1..200 — every dim key's rows
    // must survive, and the 4096-bit filter with 2 hashes must prune
    // the bulk of the 198 non-members before the join
    val probe = (1L to 200L).map(k => (k, 10.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val dim = Seq((1L, "a", 9000.0), (2L, "b", 9000.0))
      .toDF("s_suppkey", "s_name", "s_acctbal")
    val got = AdvancedJoins.bloomPrefilteredJoin(probe, dim)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 1L, 1000L), ("b", 1L, 1000L)))
  }

  test("result is bit-identical across partitionings") {
    val l = graft.core.Tables.lineitem(spark, sfDir)
    val s = graft.core.Tables.supplier(spark, sfDir)
    def run(parts: Int) =
      AdvancedJoins.bloomPrefilteredJoin(l.repartition(parts), s)
        .collect().map(_.toSeq).toSeq
    assert(run(2) === run(16))
  }
}
