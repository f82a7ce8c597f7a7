package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Spatial nearest-neighbor join with grid-cell blocking — the
  * geo-flavored sibling of the LSH/IVF family: quantize points to a
  * grid, probe the 3×3 cell ring, score only ring candidates. [EXT]
  * SURVEY §2.11 — the "match each record to its closest facility/
  * cluster/depot" join that shows up in logistics and geo-dedup; run
  * naively it is a cross join, blocked it is O(points × ring density).
  *
  * Scale shape: each point lands in ONE cell; the probe side explodes
  * to its 9 neighbor cells (a constant-factor narrow map, the geo
  * analogue of multi-probe LSH), the join keys on the cell id, and the
  * per-probe top-1 is a WindowGroupLimit-prunable rank. Density decides
  * the ring hit rate — the cell size is a tuning knob exactly like LSH
  * band width; points with an empty ring are omitted (the blocked rule
  * IS the declared contract, as in ext/Entities).
  *
  * Determinism: coordinates are synthesized from keys by exact integer
  * arithmetic + one IEEE division; distances are squared-Euclidean
  * (products and sums of two exact doubles — no libm trig, whose last
  * bits differ across engines; planar d² preserves the nearest-neighbor
  * ordering that haversine would give at city scale); ties break on the
  * supplier key. Every step replays in ANSI SQL.
  */
object Geo {

  /** Deterministic synthetic coordinates in [0, 100)² from a key. */
  private def coord(key: Column, mult: Long): Column =
    (key * mult % 100000L).cast("double") / 1000.0

  def customerPoints(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("cid"),
      coord(col("c_custkey"), 7919L).as("x"),
      coord(col("c_custkey"), 104729L).as("y"))

  def supplierPoints(supplier: DataFrame): DataFrame =
    supplier.select(col("s_suppkey").as("sid"),
      coord(col("s_suppkey"), 7919L).as("sx"),
      coord(col("s_suppkey"), 104729L).as("sy"))

  /** Nearest supplier (squared-Euclidean) within the 3×3 grid ring of
    * each customer, cellSize units per cell. Customers whose ring holds
    * no supplier are omitted — the blocked contract. */
  def nearestInRing(cust: DataFrame, supp: DataFrame,
      cellSize: Double): DataFrame = {
    val probes = cust
      .withColumn("dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("dy", explode(array(lit(-1), lit(0), lit(1))))
      .select(col("cid"), col("x"), col("y"),
        (floor(col("x") / cellSize) + col("dx")).as("cx"),
        (floor(col("y") / cellSize) + col("dy")).as("cy"))
    val anchored = supp.select(col("sid"), col("sx"), col("sy"),
      floor(col("sx") / cellSize).as("cx"),
      floor(col("sy") / cellSize).as("cy"))
    val scored = probes.join(anchored, Seq("cx", "cy"))
      .select(col("cid"), col("sid"),
        ((col("x") - col("sx")) * (col("x") - col("sx")) +
          (col("y") - col("sy")) * (col("y") - col("sy"))).as("d2"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cid")).orderBy(col("d2"), col("sid"))))
      .filter(col("rn") === 1)
      .select(col("cid").as("c_custkey"), col("sid").as("s_suppkey"),
        col("d2"))
      .orderBy(col("c_custkey"))
  }

  def nearestSupplierSql(cellSize: Double): String =
    s"""WITH c AS (
       |  SELECT c_custkey AS cid,
       |    CAST(c_custkey * 7919 % 100000 AS DOUBLE) / 1000.0 AS x,
       |    CAST(c_custkey * 104729 % 100000 AS DOUBLE) / 1000.0 AS y
       |  FROM customer),
       |s AS (
       |  SELECT s_suppkey AS sid,
       |    CAST(s_suppkey * 7919 % 100000 AS DOUBLE) / 1000.0 AS sx,
       |    CAST(s_suppkey * 104729 % 100000 AS DOUBLE) / 1000.0 AS sy
       |  FROM supplier),
       |probes AS (
       |  SELECT cid, x, y,
       |         FLOOR(x / $cellSize) + dx.i AS cx,
       |         FLOOR(y / $cellSize) + dy.i AS cy
       |  FROM c, (SELECT unnest(range(-1, 2)) AS i) dx,
       |       (SELECT unnest(range(-1, 2)) AS i) dy),
       |anchored AS (
       |  SELECT sid, sx, sy, FLOOR(sx / $cellSize) AS cx,
       |         FLOOR(sy / $cellSize) AS cy
       |  FROM s),
       |scored AS (
       |  SELECT p.cid, a.sid,
       |         (p.x - a.sx) * (p.x - a.sx) + (p.y - a.sy) * (p.y - a.sy) AS d2
       |  FROM probes p JOIN anchored a ON p.cx = a.cx AND p.cy = a.cy)
       |SELECT cid AS c_custkey, sid AS s_suppkey, d2
       |FROM (SELECT cid, sid, d2,
       |        ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d2, sid) AS rn
       |      FROM scored)
       |WHERE rn = 1
       |ORDER BY c_custkey""".stripMargin

  /** All (customer, supplier) pairs within radius `r` — the
    * distance-banded join behind geofencing, service-area assignment
    * and spatial dedup. Same grid blocking as `nearestInRing`, but with
    * `cellSize >= r` the 3×3 ring PROVABLY contains every point within
    * r of the probe (any such point's cell differs by at most one in
    * each axis), so the blocked join is EXACT — not a recall contract —
    * and the oracle is the naive cross-join filter, which is precisely
    * what proves the blocking loses nothing. Work is O(points × ring
    * density) instead of O(\|C\|·\|S\|); the d2 <= r² cut is a single
    * comparison of exact-double products, hash-safe cross-engine. */
  def radiusJoin(cust: DataFrame, supp: DataFrame, r: Double,
      cellSize: Double): DataFrame = {
    require(cellSize >= r, s"exactness needs cellSize >= r ($cellSize < $r)")
    val probes = cust
      .withColumn("dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("dy", explode(array(lit(-1), lit(0), lit(1))))
      .select(col("cid"), col("x"), col("y"),
        (floor(col("x") / cellSize) + col("dx")).as("cx"),
        (floor(col("y") / cellSize) + col("dy")).as("cy"))
    val anchored = supp.select(col("sid"), col("sx"), col("sy"),
      floor(col("sx") / cellSize).as("cx"),
      floor(col("sy") / cellSize).as("cy"))
    probes.join(anchored, Seq("cx", "cy"))
      .select(col("cid").as("c_custkey"), col("sid").as("s_suppkey"),
        ((col("x") - col("sx")) * (col("x") - col("sx")) +
          (col("y") - col("sy")) * (col("y") - col("sy"))).as("d2"))
      .filter(col("d2") <= lit(r * r))
      .orderBy(col("c_custkey"), col("s_suppkey"))
  }

  def radiusJoinSql(r: Double): String =
    s"""WITH c AS (
       |  SELECT c_custkey AS cid,
       |    CAST(c_custkey * 7919 % 100000 AS DOUBLE) / 1000.0 AS x,
       |    CAST(c_custkey * 104729 % 100000 AS DOUBLE) / 1000.0 AS y
       |  FROM customer),
       |s AS (
       |  SELECT s_suppkey AS sid,
       |    CAST(s_suppkey * 7919 % 100000 AS DOUBLE) / 1000.0 AS sx,
       |    CAST(s_suppkey * 104729 % 100000 AS DOUBLE) / 1000.0 AS sy
       |  FROM supplier)
       |SELECT c.cid AS c_custkey, s.sid AS s_suppkey,
       |       (c.x - s.sx) * (c.x - s.sx) + (c.y - s.sy) * (c.y - s.sy) AS d2
       |FROM c CROSS JOIN s
       |WHERE (c.x - s.sx) * (c.x - s.sx) + (c.y - s.sy) * (c.y - s.sy)
       |      <= ${r * r}
       |ORDER BY c_custkey, s_suppkey""".stripMargin

  def queries: Seq[(String, QueryDef)] = Seq(
    "geo_join_radius" -> QueryDef(
      (s, d) => radiusJoin(
        customerPoints(Tables.customer(s, d)),
        supplierPoints(Tables.supplier(s, d)), r = 5.0, cellSize = 5.0),
      radiusJoinSql(5.0)),
    "geo_nearest" -> QueryDef(
      (s, d) => nearestInRing(
        customerPoints(Tables.customer(s, d)),
        supplierPoints(Tables.supplier(s, d)), cellSize = 5.0),
      nearestSupplierSql(5.0)))
}
