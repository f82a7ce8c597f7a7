package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, QueryDef, Tables}

/** Correlated-subquery TPC-H shapes — Q7/Q8/Q16/Q21 adapted to the
  * fixture's slimmed columns (SURVEY.md §2.3/§2.4 widening; the fixture
  * has no l_commitdate/l_receiptdate/partsupp/p_container, so Q21's
  * lateness is re-expressed as ship-lag vs o_orderdate and Q16's
  * complaint filter as a negative supplier account balance).
  *
  * The point of this family is how the quantifiers execute at scale:
  *
  *  - Q21's `EXISTS other-supplier AND NOT EXISTS other-late-supplier`
  *    is NOT run as two extra self-joins of lineitem. Both quantifiers
  *    are per-order set facts, so one window over `l_orderkey` computes
  *    them in the same shuffle the order join already paid for —
  *    Catalyst reuses the join's hash partitioning, and the oracle SQL
  *    keeps the declarative EXISTS form to prove the rewrite is exact.
  *  - Q16's `NOT IN (subquery on a non-null key)` is a broadcast
  *    left-anti join: the exclusion list is tiny by construction
  *    (suppliers in arrears), so the quantifier costs zero shuffles.
  *  - Q7/Q8 prefilter the nation/region dims to the named sets before
  *    joining, so the 4/25-nation selectivity prunes the broadcast hash
  *    tables instead of being a post-join residual only.
  */
object SubqueryShapes {
  import Exact._

  /** TPC-H Q21 shape: suppliers who were the *sole* late shipper on a
    * finished multi-supplier order. `EXISTS (other supplier on the
    * order)` ⇔ the order's distinct-supplier set has ≥ 2 members;
    * `NOT EXISTS (other late supplier)` ⇔ the order's late-supplier set
    * is exactly {me} (the probe row is itself late, so it is in the
    * set). Both sets come from one window over `l_orderkey` — a single
    * wide shuffle instead of Q21's textbook pair of correlated
    * self-joins, and the window keys on the natural high-cardinality
    * order key so there is no straggler partition at 100 TB.
    * Factored over plain DataFrames so the spec can feed crafted orders.
    */
  def soleLateShippers(
      lineitem: DataFrame,
      orders: DataFrame,
      supplier: DataFrame,
      lagDays: Int): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        to_date(col("l_shipdate")).as("ship_date"))
      .join(
        orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        datediff(col("ship_date"), col("o_date")) > lagDays)
      .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("late_supp",
        collect_set(when(col("is_late"), col("l_suppkey"))).over(w))
      .filter(col("is_late") && col("n_supp") >= 2 &&
        size(col("late_supp")) === 1)
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  private val q: Seq[(String, QueryDef)] = Seq(

    // ---- Q7 shape: shipping volume between two nation sets, both
    //      directions, by ship year --------------------------------------
    "q7_nation_volume" -> QueryDef(
      (s, d) => {
        val setA = Seq("NATION_1", "NATION_2")
        val setB = Seq("NATION_3", "NATION_4")
        val both = setA ++ setB
        // Prefilter each nation dim to the union before broadcasting:
        // the inner joins then prune suppliers/customers to 4/25 nations
        // ahead of the big lineitem⋈orders shuffle; only the
        // cross-table direction pairing stays as a residual filter.
        val n1 = Tables.nation(s, d).filter(col("n_name").isin(both: _*))
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d).filter(col("n_name").isin(both: _*))
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate").between(
            to_timestamp(lit("1996-01-01")), to_timestamp(lit("1997-12-31"))))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(
            (col("supp_nation").isin(setA: _*) && col("cust_nation").isin(setB: _*)) ||
            (col("supp_nation").isin(setB: _*) && col("cust_nation").isin(setA: _*)))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name IN ('NATION_1','NATION_2') AND n2.n_name IN ('NATION_3','NATION_4'))
        |    OR (n1.n_name IN ('NATION_3','NATION_4') AND n2.n_name IN ('NATION_1','NATION_2')))
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    // ---- Q8 shape: one nation's share of PROMO volume into ASIA
    //      customers, by order year. The share is a single double
    //      division of two exactly-aggregated decimal sums — the same
    //      two doubles in both engines, so the quotient is bit-equal. ----
    "q8_market_share" -> QueryDef(
      (s, d) => {
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
        val vol = money(col("l_extendedprice")) * oneMinus(col("l_discount"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderdate").between(
            to_timestamp(lit("1996-01-01")), to_timestamp(lit("1997-12-31")))),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
          .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            coalesce(sum(when(col("supp_nation") === "NATION_13", vol)), lit(0))
              .cast("double").as("nation_volume"),
            sum(vol).cast("double").as("total_volume"))
          .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
          .select(col("o_year"), col("mkt_share"),
            col("nation_volume"), col("total_volume"))
          .orderBy(col("o_year"))
      },
      """SELECT o_year, nation_volume / total_volume AS mkt_share,
        |  nation_volume, total_volume
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(CAST(COALESCE(SUM(CASE WHEN n1.n_name = 'NATION_13'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2)) END), 0) AS VARCHAR) AS DOUBLE) AS nation_volume,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS total_volume
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |  GROUP BY year(o_orderdate))
        |ORDER BY o_year""".stripMargin),

    // ---- Q16 shape: supplier variety per (brand, size), excluding
    //      suppliers in arrears via NOT IN ⇒ broadcast left-anti ---------
    "q16_supplier_variety" -> QueryDef(
      (s, d) => {
        val excluded = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
          .join(excluded,
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(Tables.part(s, d).filter(col("p_type") =!= "PROMO"),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      },
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_type <> 'PROMO'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin),

    // ---- NOT-IN tri-valued semantics pin: the #1 real-user subquery
    //      trap. `x NOT IN (S)` is x <> s₁ AND x <> s₂ AND …; one NULL
    //      in S makes every conjunct UNKNOWN at best, so the predicate
    //      can never be TRUE and the query returns NOTHING. q16 above
    //      rewrites NOT IN as a plain anti join ONLY because its key is
    //      non-null by construction; this query proves the engine keeps
    //      ANSI semantics when that guarantee is absent. The exclusion
    //      list derives a NULL per solvent supplier (the fixture has no
    //      stored NULLs); variant 'raw_not_in' must count 0, the
    //      IS NOT NULL-guarded variant counts the real complement.
    //      Declarative spark.sql on purpose: Catalyst plans the raw
    //      variant as a null-aware anti join (asserted in
    //      SubqueryShapesSpec) — the semantics cost a broadcast of the
    //      exclusion list, not correctness. ------------------------------
    "notin_null_semantics" -> QueryDef(
      (s, d) => s.sql(
        s"""WITH excl AS (
           |  SELECT CASE WHEN s_acctbal < 0 THEN s_suppkey END AS bad_key
           |  FROM parquet.`$d/supplier.parquet`),
           |li AS (SELECT l_suppkey FROM parquet.`$d/lineitem.parquet`)
           |SELECT 'raw_not_in' AS variant, COUNT(*) AS n_rows
           |FROM li WHERE l_suppkey NOT IN (SELECT bad_key FROM excl)
           |UNION ALL
           |SELECT 'null_guarded' AS variant, COUNT(*) AS n_rows
           |FROM li
           |WHERE l_suppkey NOT IN
           |  (SELECT bad_key FROM excl WHERE bad_key IS NOT NULL)
           |ORDER BY variant""".stripMargin),
      """WITH excl AS (
        |  SELECT CASE WHEN s_acctbal < 0 THEN s_suppkey END AS bad_key
        |  FROM supplier)
        |SELECT 'raw_not_in' AS variant, COUNT(*) AS n_rows
        |FROM lineitem WHERE l_suppkey NOT IN (SELECT bad_key FROM excl)
        |UNION ALL
        |SELECT 'null_guarded' AS variant, COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_suppkey NOT IN
        |  (SELECT bad_key FROM excl WHERE bad_key IS NOT NULL)
        |ORDER BY variant""".stripMargin),

    // ---- Q21 shape (window rewrite; declarative EXISTS oracle) ----------
    "q21_sole_late_shipper" -> QueryDef(
      (s, d) => soleLateShippers(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.supplier(s, d),
        lagDays = 2000),
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE CAST(l1.l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 2000
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND CAST(l3.l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 2000)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin)
  ,

    // ---- recursive CTE (Spark 4.x WITH RECURSIVE → UnionLoop): the
    //      ancestor chain of an IMPLICIT binary tree over customer ids
    //      (parent = id div 2). Depth is log2(maxId) — bounded by
    //      construction, no cycles — so UNION ALL recursion terminates
    //      structurally at any SF; per-step work is a narrow map off
    //      the previous level, never a rescan of the base table. -------
    "recursive_ancestors" -> QueryDef(
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_rec")
        s.sql(
          """WITH RECURSIVE anc AS (
            |  SELECT c_custkey AS start, c_custkey AS node, 0 AS depth
            |  FROM customer_rec WHERE c_custkey % 101 = 0
            |  UNION ALL
            |  SELECT start, node div 2, depth + 1 FROM anc WHERE node > 1)
            |SELECT start, node AS ancestor, depth FROM anc
            |ORDER BY start, depth""".stripMargin)
      },
      """WITH RECURSIVE anc AS (
        |  SELECT c_custkey AS start, c_custkey AS node, 0 AS depth
        |  FROM customer WHERE c_custkey % 101 = 0
        |  UNION ALL
        |  SELECT start, node // 2, depth + 1 FROM anc WHERE node > 1)
        |SELECT start, node AS ancestor, CAST(depth AS INT) AS depth FROM anc
        |ORDER BY start, depth""".stripMargin),

    // ---- LATERAL correlated subquery with LIMIT: per-region top-2
    //      customers by balance. The decorrelated plan is the same
    //      window top-k as topk_per_group — the declarative LATERAL
    //      form proves the SQL surface, the oracle that decorrelation
    //      is exact. --------------------------------------------------
    "join_lateral" -> QueryDef(
      (s, d) => {
        Tables.region(s, d).createOrReplaceTempView("region_lat")
        Tables.nation(s, d).createOrReplaceTempView("nation_lat")
        Tables.customer(s, d).createOrReplaceTempView("customer_lat")
        s.sql(
          """SELECT r.r_name, c.c_name, c.c_acctbal
            |FROM region_lat r, LATERAL (
            |  SELECT c_name, c_acctbal FROM customer_lat
            |  JOIN nation_lat ON n_nationkey = c_nationkey
            |  WHERE n_regionkey = r.r_regionkey
            |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
            |ORDER BY r_name, c_acctbal DESC, c_name""".stripMargin)
      },
      """SELECT r.r_name, c.c_name, c.c_acctbal
        |FROM region r, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  JOIN nation ON n_nationkey = c_nationkey
        |  WHERE n_regionkey = r.r_regionkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY r_name, c_acctbal DESC, c_name""".stripMargin)
  )

  def queries: Seq[(String, QueryDef)] = q
}
