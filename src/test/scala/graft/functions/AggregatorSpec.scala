package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** A9 typed-Aggregator surface + A7 approximate distinct. */
class AggregatorSpec extends SparkSuite {

  test("WeightedMean aggregator == hand computation, stable under partitioning") {
    import spark.implicits._
    val data = Seq((10.0, 1.0), (20.0, 3.0), (40.0, 6.0))
    val expected = data.map { case (x, w) => x * w }.sum / data.map(_._2).sum
    val ds = data.toDS()
    val got = ds.select(TypedAggregators.WeightedMean.toColumn).collect()(0)
    assert(math.abs(got - expected) < 1e-12)
    val repart = ds.repartition(5)
      .select(TypedAggregators.WeightedMean.toColumn).collect()(0)
    assert(math.abs(repart - expected) < 1e-12)
  }

  test("WeightedMean of empty input is NaN") {
    import spark.implicits._
    val got = Seq.empty[(Double, Double)].toDS()
      .select(TypedAggregators.WeightedMean.toColumn).collect()(0)
    assert(got.isNaN)
  }

  test("MinHashSignature aggregator matches the HOF pipeline's per-doc mins") {
    import spark.implicits._
    val k = 4
    val hashes = Seq(
      Array(5L, 9L, 1L, 7L),
      Array(3L, 12L, 2L, 7L),
      Array(8L, 2L, 6L, 4L))
    val agg = new TypedAggregators.MinHashSignature(k)
    val got = hashes.toDS().repartition(3).select(agg.toColumn).collect()(0)
    assert(got.toSeq == Seq(3L, 2L, 1L, 4L))
  }

  test("approx_count_distinct within 5% of exact (A7)") {
    val li = Tables.lineitem(spark, sfDir)
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.03,
      s"approx $approx vs exact $exact")
  }
}
