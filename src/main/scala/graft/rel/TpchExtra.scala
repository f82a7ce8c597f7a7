package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, QueryDef, Tables}

/** Remaining TPC-H-expressible shapes on the slimmed fixture (SURVEY.md
  * §2.3/§2.4 widening): Q6's pure scan-side aggregate, Q9's multi-dim
  * profit rollup, and a Q20-style dominant-supplier quantifier. (Q2/Q11/
  * Q20-verbatim need `partsupp`, which the fixture does not ship; the
  * Q20 shape here keeps the interesting part — an aggregated correlated
  * threshold — expressed against shipped volume instead of stock.)
  *
  * Scale notes: Q6 is the canonical predicate-pushdown benchmark — the
  * timestamp range reaches the parquet scan as min/max stats filters and
  * the aggregate is one map-side-combined scan, zero joins. Q9 joins
  * only broadcast dims to the lineitem⋈orders backbone. The Q20 shape
  * computes per-(part, supplier) volume ONCE and derives each part's
  * total with a window over the same shuffle — no second scan, no
  * self-join, keyed on the high-cardinality part key.
  */
object TpchExtra {
  import Exact._

  private val q: Seq[(String, QueryDef)] = Seq(

    // ---- Q6: forecast revenue change — scan, filter, one aggregate ------
    "q6_forecast_revenue" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          to_timestamp(lit("1996-01-01")), to_timestamp(lit("1996-12-31"))) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines")),
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),

    // ---- Q9 shape: profit by supplier nation and order year. The
    //      fixture has no partsupp, so cost = retail price × quantity
    //      (the shape — revenue minus a part-priced cost term summed
    //      exactly in DECIMAL — is what matters). Dims broadcast; the
    //      only shuffle is lineitem⋈orders + the final small rollup. ----
    "q9_profit_by_nation" -> QueryDef(
      (s, d) => {
        val amount = money(col("l_extendedprice")) * oneMinus(col("l_discount")) -
          money(col("p_retailprice")) * col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(8, 2))
        Tables.lineitem(s, d)
          .join(Tables.part(s, d).filter(col("p_name").contains("red")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(sum(amount).cast("double").as("profit"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))
        |         - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS profit,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin),

    // ---- Q11 shape: parts whose shipped value exceeds a threshold
    //      derived from the GLOBAL aggregate — here 1.5× the mean
    //      per-part value, which keeps the selectivity meaningful at
    //      every scale factor (Q11's own fraction is SF-dependent). The
    //      global mean is one extra reduction over the SAME per-part
    //      aggregate (persisted — no second scan of lineitem), shipped
    //      back as a literal; both sums are exact DECIMAL and the
    //      threshold is the same two-double product in both engines, so
    //      boundary rows agree bit-for-bit. ------------------------------
    "q11_important_parts" -> QueryDef(
      (s, d) => {
        val perPart = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(sum(money(col("l_extendedprice"))).as("value_d"))
          .persist()
        // fully declarative global threshold: a 1-row aggregate over the
        // SAME persisted per-part table, broadcast back as a scalar —
        // no driver-side action inside the query body
        val thresh = perPart.agg(
          (sum(col("value_d")).cast("double") / count(lit(1)) * 1.5)
            .as("thresh"))
        perPart.crossJoin(broadcast(thresh))
          .filter(col("value_d").cast("double") > col("thresh"))
          .select(col("l_partkey").as("partkey"),
            col("value_d").cast("double").as("part_value"))
          .orderBy(col("part_value").desc, col("partkey"))
      },
      """WITH pp AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_d
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey AS partkey, CAST(value_d AS DOUBLE) AS part_value
        |FROM pp
        |WHERE CAST(value_d AS DOUBLE) >
        |  (SELECT CAST(CAST(SUM(value_d) AS VARCHAR) AS DOUBLE) / COUNT(*) FROM pp) * 1.5
        |ORDER BY part_value DESC, partkey""".stripMargin),

    // ---- Q20 shape: suppliers who dominate a part's 1996 volume
    //      (shipped > 50% of it). Per-(part, supplier) volumes and each
    //      part's total come from ONE aggregation + a window over the
    //      same partkey shuffle; the share is a single double division
    //      of two exact decimal sums, identical cross-engine. -----------
    "q20_dominant_supplier" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("l_partkey"))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate").between(
            to_timestamp(lit("1996-01-01")), to_timestamp(lit("1996-12-31"))))
          // one shuffle for agg AND window: hashpartitioning(l_partkey)
          // satisfies the aggregate's ClusteredDistribution(partkey,
          // suppkey) — same tuples co-locate — and is exactly the window
          // spec, so EnsureRequirements inserts no second exchange
          // (asserted in PlanSpec)
          .repartition(col("l_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(money(col("l_quantity"))).as("qty_d"))
          .withColumn("share",
            col("qty_d").cast("double") / sum(col("qty_d")).over(w).cast("double"))
          .filter(col("share") > 0.5)
          .join(Tables.supplier(s, d),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(count(lit(1)).as("n_dominant"))
          .orderBy(col("n_dominant").desc, col("s_suppkey"))
      },
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_d
        |  FROM lineitem
        |  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  GROUP BY l_partkey, l_suppkey),
        |sh AS (
        |  SELECT l_suppkey,
        |    CAST(qty_d AS DOUBLE) /
        |      CAST(CAST(SUM(qty_d) OVER (PARTITION BY l_partkey) AS VARCHAR) AS DOUBLE) AS share
        |  FROM ps)
        |SELECT s_suppkey, s_name, COUNT(*) AS n_dominant
        |FROM sh JOIN supplier ON s_suppkey = l_suppkey
        |WHERE share > 0.5
        |GROUP BY s_suppkey, s_name
        |ORDER BY n_dominant DESC, s_suppkey""".stripMargin)
  )

  def queries: Seq[(String, QueryDef)] = q
}
