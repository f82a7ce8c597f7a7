package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Salted joins must be result-identical to their unsalted twins. */
class SkewSpec extends SparkSuite {

  test("salted join == plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail, joined to a small dim
    val large = ((1 to 10000).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, s"tail$i")))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("dk", "name")

    val plain = large.join(dim, col("k") === col("dk"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .orderBy(col("name")).collect().toSeq
    val salted = Skew.saltedJoin(large, dim, "k", "dk", factor = 8)
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .orderBy(col("name")).collect().toSeq
    assert(salted == plain)
  }

  test("left outer salted join preserves unmatched rows exactly once") {
    import spark.implicits._
    val large = Seq((1L, "x"), (9L, "unmatched")).toDF("k", "payload")
    val dim = Seq((1L, "hot")).toDF("dk", "name")
    val out = Skew.saltedJoin(large, dim, "k", "dk", factor = 4, "left")
      .orderBy(col("k")).collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(out(1).fieldIndex("name")))
  }
}
