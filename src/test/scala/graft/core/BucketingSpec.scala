package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucketed co-located joins: shuffle paid at write, not per query. */
class BucketingSpec extends SparkSuite {

  test("join of two same-bucketed tables plans without Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.orders(spark, sfDir),
        "orders_b", "o_orderkey", 8, sortCols = Seq("o_orderkey"))
      Bucketing.writeBucketed(Tables.lineitem(spark, sfDir),
        "lineitem_b", "l_orderkey", 8, sortCols = Seq("l_orderkey"))
      val joined = Bucketing.cocatedJoin(spark, "lineitem_b", "orders_b",
        "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // the aggregation above the join still exchanges on its group key;
      // the JOIN KEYS must never be shuffled (bucketing absorbed it)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$p")
      assert(p.contains("SelectedBucketsCount"), "scan must be bucket-aware")
      // same join unbucketed DOES shuffle on the join keys
      val unbucketed = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      unbucketed.collect()
      val up = unbucketed.queryExecution.executedPlan.toString
      assert(up.contains("Exchange hashpartitioning(l_orderkey") ||
        up.contains("Exchange hashpartitioning(o_orderkey"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("layout_bucketed declared path: zero-exchange join, layout-independent result") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = ZOrder.bucketedFactJoin(spark, sfDir)
      val got = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed fact join must not shuffle its inputs:\n$p")
      // the layout must never change the answer: same agg off flat parquet
      val flat = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          Exact.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderstatus"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got === flat)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
