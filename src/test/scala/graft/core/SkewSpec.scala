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

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    import spark.implicits._
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null))
      .toMap
    try {
      // force SMJ and make the hot partition count as skewed at test size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // payload must be incompressible-ish AND consumed above the join,
      // or column pruning + shuffle compression shrink the hot partition
      // below any threshold
      def pay(i: Int) = s"payload-$i-${java.lang.Long.toHexString(i * 2654435761L)}"
      val large = ((1 to 20000).map(i => (1L, pay(i))) ++
        (2 to 200).flatMap(k => (1 to 5).map(i => (k.toLong, pay(i)))))
        .toDF("k", "payload")
      val right = (1 to 200).map(k => (k.toLong, s"name$k")).toDF("dk", "name")
      val joined = large.join(right, col("k") === col("dk"))
        .groupBy(col("name")).agg(count(lit(1)).as("n"), max(col("payload")).as("p"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("AQEShuffleRead skewed"),
        s"expected AQE skew-join split in:\n$p")
    } finally restore.foreach { case (k, v) =>
      v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
    }
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
