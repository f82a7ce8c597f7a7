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

  test("pit features: strict point-in-time cut, equal-ts order by " +
      "event_id, trailing error window closes at 30 minutes") {
    import spark.implicits._
    def ev(rows: (Long, String, Long, String, Double)*) =
      rows.toDF("event_id", "tss", "user_id", "event_type", "value")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
    val e = ev(
      (1L, "2024-01-01 10:00:00", 7L, "view", 5.0),
      (2L, "2024-01-01 10:10:00", 7L, "click", 7.0),
      (3L, "2024-01-01 10:20:00", 7L, "error", 0.0),
      (4L, "2024-01-01 10:30:00", 7L, "purchase", 9.0),
      (5L, "2024-01-01 11:00:00", 7L, "purchase", 9.0),
      // equal-ts: view id 6 < purchase id 7 leaks IN; view id 9 > 8 not
      (6L, "2024-02-01 09:00:00", 8L, "view", 1.0),
      (7L, "2024-02-01 09:00:00", 8L, "purchase", 2.0),
      (9L, "2024-03-01 09:00:00", 9L, "view", 3.0),
      (8L, "2024-03-01 09:00:00", 9L, "purchase", 4.0))
    val got = AdvancedJoins.pitFeatures(e)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(2)), Option(r.get(3)), r.getBoolean(4), r.getLong(5)))
      .toMap
    assert(got(4L) === ((Some(5.0), Some(7.0), false, 1L)),
      "error at 10:20 is inside purchase@10:30's 30-minute window")
    assert(got(5L) === ((Some(5.0), Some(7.0), false, 0L)),
      "at 11:00 the 10:20 error has aged out")
    assert(got(7L) === ((Some(1.0), None, false, 0L)),
      "equal-ts smaller event_id is point-in-time visible")
    assert(got(8L) === ((None, None, false, 0L)),
      "equal-ts larger event_id must NOT leak")
  }
}
