package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Completeness of the grid-blocked interval overlap join: any two
  * overlapping intervals share at least one covered grid cell, for ANY
  * interval length (the cell explode covers lo div G .. hi div G, not
  * just the short-interval case the declared query exercises). */
class IntervalJoinSpec extends SparkSuite {

  test("property: grid-blocked overlap pairs ≡ naive theta join, " +
      "lengths beyond the grid pitch included") {
    import org.scalacheck.Gen
    import spark.implicits._
    val G = 7
    val gen = Gen.listOfN(120, for {
      cust <- Gen.chooseNum(1L, 8L)
      lo <- Gen.chooseNum(0L, 60L)
      len <- Gen.chooseNum(0L, 20L) // up to ~3 grid cells
    } yield (cust, lo, lo + len))
    for (trial <- 1 to 3) {
      val iv = gen.sample.get.zipWithIndex
        .map { case ((c, lo, hi), i) => (c, i.toLong, lo, hi) }
        .toDF("cust", "okey", "lo", "hi")
      val cells = iv.select(col("cust"), col("okey"), col("lo"), col("hi"),
        explode(expr(s"sequence(lo div $G, hi div $G)")).as("cell"))
      val blocked = cells.as("a").join(cells.as("b"),
          col("a.cust") === col("b.cust") && col("a.cell") === col("b.cell") &&
            col("a.okey") < col("b.okey") &&
            col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
        .select(col("a.cust"), col("a.okey").as("ka"), col("b.okey").as("kb"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val naive = iv.as("a").join(iv.as("b"),
          col("a.cust") === col("b.cust") && col("a.okey") < col("b.okey") &&
            col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
        .select(col("a.cust"), col("a.okey").as("ka"), col("b.okey").as("kb"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(blocked == naive, s"trial=$trial")
    }
  }
}
