package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Grid-blocked nearest neighbor (ext/Geo): blocked result ≡ brute
  * force whenever the true nearest sits inside the ring, empty rings
  * omit, ring boundary behaves. */
class GeoSpec extends SparkSuite {
  import spark.implicits._

  private def pts(rows: (Long, Double, Double)*) = rows.toDF("cid", "x", "y")
  private def sups(rows: (Long, Double, Double)*) = rows.toDF("sid", "sx", "sy")

  test("nearest in ring matches brute force when the ring contains it") {
    val c = pts((1L, 10.0, 10.0), (2L, 52.0, 48.0))
    val s = sups((7L, 11.0, 11.0), (8L, 14.0, 10.0), (9L, 50.0, 50.0))
    val got = Geo.nearestInRing(c, s, cellSize = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 7L), (2L, 9L)))
  }

  test("a customer with an empty 3x3 ring is omitted, not mismatched") {
    val c = pts((1L, 10.0, 10.0), (2L, 90.0, 90.0))
    val s = sups((7L, 12.0, 12.0))
    val got = Geo.nearestInRing(c, s, cellSize = 5.0)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("equidistant suppliers tie-break on the lower supplier id") {
    val c = pts((1L, 10.0, 10.0))
    val s = sups((8L, 12.0, 10.0), (7L, 8.0, 10.0)) // both d2 = 4
    val got = Geo.nearestInRing(c, s, cellSize = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 7L)))
  }

  test("fixture-wide: every blocked answer is ring-optimal vs brute force") {
    val c = Geo.customerPoints(graft.core.Tables.customer(spark, sfDir))
    val s = Geo.supplierPoints(graft.core.Tables.supplier(spark, sfDir))
    val blocked = Geo.nearestInRing(c, s, cellSize = 5.0)
    // brute force nearest per customer (fine at spec scale)
    val brute = c.crossJoin(s)
      .select(col("cid"),
        col("sid"),
        ((col("x") - col("sx")) * (col("x") - col("sx")) +
          (col("y") - col("sy")) * (col("y") - col("sy"))).as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cid")).orderBy(col("d2"), col("sid"))))
      .filter(col("rn") === 1)
      .select(col("cid"), col("sid").as("bsid"), col("d2").as("bd2"))
    // wherever blocked found someone, it must equal the true nearest IF
    // the true nearest is within one cell size (always inside the ring)
    val bad = blocked.join(brute, blocked("c_custkey") === brute("cid"))
      .filter(col("bd2") <= 5.0 * 5.0 && col("s_suppkey") =!= col("bsid"))
    assert(bad.count() === 0,
      "blocked result must equal brute force whenever the true nearest is in-ring")
  }

  test("radius join: blocked result is EXACTLY the cross-join filter") {
    val cust = Geo.customerPoints(graft.core.Tables.customer(spark, sfDir))
    val supp = Geo.supplierPoints(graft.core.Tables.supplier(spark, sfDir))
    val blocked = Geo.radiusJoin(cust, supp, r = 5.0, cellSize = 5.0)
      .select(col("c_custkey"), col("s_suppkey"))
    val naive = cust.crossJoin(supp)
      .filter((col("x") - col("sx")) * (col("x") - col("sx")) +
        (col("y") - col("sy")) * (col("y") - col("sy")) <= lit(25.0))
      .select(col("cid").as("c_custkey"), col("sid").as("s_suppkey"))
    assert(blocked.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(blocked).count() === 0)
    assert(blocked.count() > 0, "fixture must exercise the radius join")
  }

  test("radius join: cellSize < r is rejected (exactness precondition)") {
    val cust = Geo.customerPoints(graft.core.Tables.customer(spark, sfDir))
    val supp = Geo.supplierPoints(graft.core.Tables.supplier(spark, sfDir))
    assertThrows[IllegalArgumentException] {
      Geo.radiusJoin(cust, supp, r = 5.0, cellSize = 4.0)
    }
  }
}
