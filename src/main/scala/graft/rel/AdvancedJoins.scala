package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, QueryDef, Tables}

/** Non-equi join surface (SURVEY.md §2.3 J4/J6).
  *
  * Range join: band dimension is a literal broadcast side → Spark plans
  * BroadcastNestedLoopJoin over a handful of bands; at 100 TB the fact
  * side streams through without a shuffle.
  *
  * As-of join: implemented with the union-and-running-last trick — tag
  * both streams, sort within the key partition by (ts, tag), carry the
  * last reference timestamp forward with a running window. This is a
  * single shuffle on the join key (no per-row range probe, no quadratic
  * pair-join), the same shape MERGE_ASOF compiles to in stream
  * processors. The DuckDB oracle states the semantics declaratively as a
  * correlated MAX subquery.
  *
  * Broadcast policy (repo-wide, see also RelQueries/SubqueryShapes/
  * TpchExtra): explicit `broadcast()` hints are reserved for sides whose
  * size is BOUNDED BY CONSTRUCTION — nation/region (fixed cardinality at
  * any SF), literal band tables, single-row scalar aggregates, collected
  * centroid sets. SF-proportional dimensions (customer, part, supplier)
  * are deliberately UNhinted: at local SFs the planner's size statistics
  * pick the identical BroadcastHashJoin on its own, while at 100 TB an
  * unconditional hint would force a driver OOM where AQE would have
  * size-gated the decision.
  */
object AdvancedJoins {
  import Exact._

  /** Shared oracle for both as-of formulations (composed window twin and
    * the custom merge operator): the semantics stated declaratively as a
    * correlated MAX subquery. */
  private val asofOracleSql: String =
    """SELECT e1.event_id, e1.user_id,
      |  strftime(CAST((SELECT max(e2.ts) FROM events e2
      |                 WHERE e2.user_id = e1.user_id AND e2.event_type = 'view'
      |                   AND e2.ts <= e1.ts) AS TIMESTAMP),
      |           '%Y-%m-%d %H:%M:%S.%f') AS asof_view_ts
      |FROM events e1
      |WHERE e1.event_type = 'purchase'
      |ORDER BY e1.user_id, e1.event_id""".stripMargin

  private val q: Seq[(String, QueryDef)] = Seq(

    // ---- J4 range (theta) join against a literal band dimension ---------
    "join_range_bands" -> QueryDef(
      (s, d) => {
        val bands = s.createDataFrame(Seq(
          ("band_0_100k", 0, 100000),
          ("band_100k_200k", 100000, 200000),
          ("band_200k_300k", 200000, 300000),
          ("band_300k_400k", 300000, 400000),
          ("band_400k_up", 400000, 1000000000)))
          .toDF("band", "lo", "hi")
        Tables.orders(s, d)
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("band"))
      },
      """SELECT band, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders
        |JOIN (VALUES ('band_0_100k', 0, 100000),
        |             ('band_100k_200k', 100000, 200000),
        |             ('band_200k_300k', 200000, 300000),
        |             ('band_300k_400k', 300000, 400000),
        |             ('band_400k_up', 400000, 1000000000)) AS b(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin),

    // ---- J6 as-of join: for each purchase, the latest view at-or-before
    //      it by the same user ------------------------------------------
    "join_asof" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        // tag = 0 for the reference stream (views), 1 for probes
        // (purchases); at equal ts the view sorts first, so "<=" holds.
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        views.unionByName(buys)
          .withColumn("asof_view_ts",
            last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"),
            date_format(col("asof_view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("asof_view_ts"))
          .orderBy(col("user_id"), col("event_id"))
      },
      asofOracleSql),

    // ---- J6b FORWARD as-of join (earliest view AT-OR-AFTER each
    //      purchase): the mirror of join_asof — views tag 2 so an
    //      equal-ts view sorts AFTER the probe and the current-row-to-
    //      following frame includes it; `first(ignoreNulls)` replaces
    //      `last`. Same single union + one keyed window sort, no
    //      events×events join ------------------------------------------
    "join_asof_forward" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), lit(2).as("tag"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("tag"), col("event_id"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        views.unionByName(buys)
          .withColumn("next_view_ts",
            first(when(col("tag") === 2, col("ts")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"),
            date_format(col("next_view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("next_view_ts"))
          .orderBy(col("user_id"), col("event_id"))
      },
      """SELECT e1.event_id, e1.user_id,
        |  strftime(CAST((SELECT min(e2.ts) FROM events e2
        |                 WHERE e2.user_id = e1.user_id AND e2.event_type = 'view'
        |                   AND e2.ts >= e1.ts) AS TIMESTAMP),
        |           '%Y-%m-%d %H:%M:%S.%f') AS next_view_ts
        |FROM events e1
        |WHERE e1.event_type = 'purchase'
        |ORDER BY e1.user_id, e1.event_id""".stripMargin),

    // ---- J6d as-of join with TOLERANCE (merge_asof's tolerance
    //      parameter): the backward match nulls out when older than
    //      30 minutes — microsecond-integer gap compare, so the cutoff
    //      is exact in both engines -------------------------------------
    "join_asof_tolerance" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        views.unionByName(buys)
          .withColumn("prev_ts",
            last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .withColumn("asof_view_ts",
            when(unix_micros(col("ts")) - unix_micros(col("prev_ts"))
              <= 1800000000L, col("prev_ts")))
          .select(col("event_id"), col("user_id"),
            date_format(col("asof_view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("asof_view_ts"))
          .orderBy(col("user_id"), col("event_id"))
      },
      """SELECT e1.event_id, e1.user_id,
        |  strftime(CAST((SELECT max(e2.ts) FROM events e2
        |                 WHERE e2.user_id = e1.user_id AND e2.event_type = 'view'
        |                   AND e2.ts <= e1.ts
        |                   AND epoch_us(e1.ts) - epoch_us(e2.ts) <= 1800000000)
        |            AS TIMESTAMP),
        |           '%Y-%m-%d %H:%M:%S.%f') AS asof_view_ts
        |FROM events e1
        |WHERE e1.event_type = 'purchase'
        |ORDER BY e1.user_id, e1.event_id""".stripMargin),

    // ---- J6c NEAREST as-of join: per purchase, the view minimizing
    //      |Δts| — backward and forward passes composed in one plan
    //      (both windows share the user_id sort), tie to the earlier
    //      view, microsecond-integer gaps so the comparison is exact --
    "join_asof_nearest" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"))
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("tag"), col("event_id"))
        val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        views.unionByName(buys)
          .withColumn("prev_ts",
            last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(wb))
          .withColumn("next_ts",
            first(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(wf))
          .filter(col("tag") === 1)
          .withColumn("gap_prev",
            unix_micros(col("ts")) - unix_micros(col("prev_ts")))
          .withColumn("gap_next",
            unix_micros(col("next_ts")) - unix_micros(col("ts")))
          .withColumn("nearest_view_ts",
            when(col("next_ts").isNull, col("prev_ts"))
              .when(col("prev_ts").isNull, col("next_ts"))
              .when(col("gap_prev") <= col("gap_next"), col("prev_ts"))
              .otherwise(col("next_ts")))
          .select(col("event_id"), col("user_id"),
            date_format(col("nearest_view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("nearest_view_ts"))
          .orderBy(col("user_id"), col("event_id"))
      },
      """WITH p AS (
        |  SELECT e1.event_id, e1.user_id, e1.ts,
        |    (SELECT max(e2.ts) FROM events e2
        |     WHERE e2.user_id = e1.user_id AND e2.event_type = 'view'
        |       AND e2.ts <= e1.ts) AS prev_ts,
        |    (SELECT min(e2.ts) FROM events e2
        |     WHERE e2.user_id = e1.user_id AND e2.event_type = 'view'
        |       AND e2.ts > e1.ts) AS next_ts
        |  FROM events e1 WHERE e1.event_type = 'purchase')
        |SELECT event_id, user_id,
        |  strftime(CAST(
        |    CASE WHEN next_ts IS NULL THEN prev_ts
        |         WHEN prev_ts IS NULL THEN next_ts
        |         WHEN epoch_us(ts) - epoch_us(prev_ts)
        |              <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
        |         ELSE next_ts END AS TIMESTAMP),
        |    '%Y-%m-%d %H:%M:%S.%f') AS nearest_view_ts
        |FROM p ORDER BY user_id, event_id""".stripMargin),

    // ---- J6 as-of join through the CUSTOM operator (graft.plans.AsOfJoin:
    //      logical node → injected strategy → co-partitioned single-pass
    //      merge exec) — same semantics, same oracle, minimal plan:
    //      two key-shuffles + sorts and O(1) merge state instead of the
    //      composed union + full window sort --------------------------------
    "join_asof_custom" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        graft.plans.AsOfJoin.asof(buys, views, "user_id", "ts", "v_user", "v_ts")
          .select(col("event_id"), col("user_id"),
            date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("asof_view_ts"))
          .orderBy(col("user_id"), col("event_id"))
      },
      asofOracleSql),

    // ---- J2 five-way snowflake join (TPC-H Q5 shape) ---------------------
    "q5_region_revenue" -> QueryDef(
      (s, d) => {
        val r = Tables.region(s, d)
        val n = Tables.nation(s, d)
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val l = Tables.lineitem(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_lineitems"))
          .orderBy(col("r_name"))
      },
      """SELECT r_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin)
    ,

    // ---- J2/A6 returned-item revenue per customer (TPC-H Q10 shape) -----
    "q10_returned_revenue" -> QueryDef(
      (s, d) => {
        val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        // no broadcast hints: customer grows with SF (~150k × SF rows), so
        // an unconditional hint would OOM the driver at 100×. AQE picks
        // broadcast at runtime whenever a side actually fits the threshold
        // — the size-gated version of the same plan, safe at any scale
        l.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      """SELECT c_custkey, c_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin),

    // ---- J2 part-side rollup (broadcast dim on the build side) ----------
    "part_brand_stats" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"),
          min(col("p_retailprice")).as("min_retail"),
          max(col("p_retailprice")).as("max_retail"))
        .orderBy(col("p_brand")),
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  MIN(p_retailprice) AS min_retail, MAX(p_retailprice) AS max_retail
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // ---- A6 conditional-ratio aggregate (TPC-H Q14 shape); the ratio is
    //      one double division of two exact decimal sums ------------------
    "q14_promo_share" -> QueryDef(
      (s, d) => {
        val rev = money(col("l_extendedprice")) * oneMinus(col("l_discount"))
        Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .agg(
            (sum(when(col("p_type").startsWith("PROMO"), rev)).cast("double") * 100.0 /
              sum(rev).cast("double")).as("promo_share_pct"),
            count(lit(1)).as("n_items"))
      },
      """SELECT
        |  CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |           THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2)) END) AS VARCHAR) AS DOUBLE) * 100.0 /
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE)
        |    AS promo_share_pct,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin),

    // ---- O4/A6 window-over-aggregate: best supplier per part.
    //      repartition(l_partkey) first: hashpartitioning(partkey)
    //      satisfies the (partkey, suppkey) aggregate's clustering AND
    //      the window spec, so the aggregate-then-rank shape costs ONE
    //      shuffle, not two — with WindowGroupLimit still bounding the
    //      per-key sort to the top row. Tradeoff, measured: this ships
    //      raw (narrow) rows instead of partial-aggregated ones; with
    //      ~few lines per (part, supplier) the single raw shuffle is
    //      SMALLER than two reduced shuffles (8.9 vs 14.3 MB at sf0.1)
    //      and one whole stage cheaper. At extreme per-key duplication
    //      the partial-agg-first shape wins bytes back — flip the
    //      repartition off when lines/(part,supplier) ≫ 10. ---------------
    "best_supplier_per_part" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("revenue").desc, col("l_suppkey"))
        Tables.lineitem(s, d)
          .repartition(col("l_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(dsum(col("l_extendedprice")).as("revenue"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_partkey").as("partkey"),
            col("l_suppkey").as("best_suppkey"), col("revenue"))
          .orderBy(col("partkey"))
      },
      """SELECT l_partkey AS partkey, l_suppkey AS best_suppkey, revenue FROM (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue,
        |    ROW_NUMBER() OVER (PARTITION BY l_partkey
        |      ORDER BY CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) DESC, l_suppkey) AS rn
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |WHERE rn = 1
        |ORDER BY partkey""".stripMargin),

    // ---- J3/A6 EXISTS + grouped count (TPC-H Q4 shape) ------------------
    "q4_order_priority_check" -> QueryDef(
      (s, d) => {
        val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")).distinct()
        Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01")))
          .join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // ---- A6 two-way conditional counts (TPC-H Q12 shape) ----------------
    "q12_priority_buckets" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).cast("long").as("low_line_count"))
        .orderBy(col("l_linestatus")),
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin),

    // ---- J2 supplier activity -------------------------------------------
    "supplier_activity" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("s_suppkey")),
      """SELECT s_suppkey, s_name, COUNT(*) AS n_items,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin),

    // ---- J2/A6 aggregate-of-aggregate distribution (TPC-H Q13 shape):
    //      left join keeps zero-order customers, then the per-customer
    //      counts are themselves grouped — two shuffles, both on keys
    //      that shrink monotonically ---------------------------------------
    "q13_customer_distribution" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // ---- A6/J3 HAVING-subquery semi join (TPC-H Q18 shape): the inner
    //      aggregate reduces lineitem to qualifying orderkeys BEFORE any
    //      join touches the wide tables -----------------------------------
    "q18_large_volume" -> QueryDef(
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 250)
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            col("o_totalprice"), col("total_qty").cast("double").as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(l_quantity) > 250) big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin),

    // ---- P7/J2 disjunctive join predicates (TPC-H Q19 shape): the
    //      OR-of-ANDs must still push the shared l_partkey = p_partkey
    //      equi-condition into a hash join, with the disjunction as a
    //      post-join filter — not a nested-loop over the cross space -----
    "q19_discounted_revenue" -> QueryDef(
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        l.join(p, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 35)))
          .agg(sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)""".stripMargin),

    // ---- A6/J2 correlated per-group average (TPC-H Q17 shape): lineitems
    //      below half their part's average quantity. The correlated
    //      subquery decorrelates to one grouped aggregate joined back to
    //      the fact — per-part averages are exact (integral doubles), so
    //      the threshold compare is engine-independent -------------------
    "q17_small_quantity" -> QueryDef(
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val avgQ = l.groupBy(col("l_partkey").as("p_key"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        l.join(avgQ, col("l_partkey") === col("p_key"))
          .filter(col("l_quantity") < col("avg_qty") * 0.5)
          .agg(dsum(col("l_extendedprice")).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem l1
        |WHERE l_quantity < 0.5 * (
        |  SELECT avg(l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)""".stripMargin),

    // ---- A6 argmax-by-aggregate (TPC-H Q15 shape): supplier(s) whose
    //      revenue equals the maximum — revenue is decimal-exact, so the
    //      equality join against the max scalar is safe cross-engine ----
    "q15_top_supplier" -> QueryDef(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy(col("l_suppkey"))
          .agg(dsum(col("l_extendedprice")).as("revenue"))
        val top = rev.agg(max(col("revenue")).as("max_rev"))
        rev.crossJoin(broadcast(top))
          .filter(col("revenue") === col("max_rev"))
          .select(col("l_suppkey"), col("revenue"))
          .orderBy(col("l_suppkey"))
      },
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT l_suppkey, revenue FROM rev
        |WHERE revenue = (SELECT max(revenue) FROM rev)
        |ORDER BY l_suppkey""".stripMargin),

    // ---- J3/A6 scalar subquery + anti join (TPC-H Q22 shape): customers
    //      with above-average positive balances and no FINISHED orders,
    //      rolled up by nation — anti join against the filtered orders
    //      side, threshold from a scalar subquery computed once and
    //      broadcast (every fixture customer has SOME order, so the
    //      status filter is what keeps the anti join non-vacuous) --------
    "q22_idle_balances" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val avgPos = c.filter(col("c_acctbal") > 0)
          .agg((dsum(col("c_acctbal")) / count(col("c_acctbal"))).as("avg_bal"))
        c.join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .crossJoin(broadcast(avgPos))
          .filter(col("c_acctbal") > col("avg_bal"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_custs"),
            dsum(col("c_acctbal")).as("total_bal"))
          .orderBy(col("c_nationkey"))
      },
      """SELECT c_nationkey, COUNT(*) AS n_custs,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(c_acctbal)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin),

    // ---- salted join (core/Skew): the declared gate IS the semantics
    //      proof — the salted physical rewrite (hot keys spread over 8
    //      sub-keys, build side replicated per salt) must reproduce the
    //      plain join bit-for-bit, so its oracle is the UNSALTED SQL.
    //      At 100 TB this is the manual fix when one key floods a
    //      shuffle partition and AQE can't see it (e.g. building a
    //      broadcast-unfriendly skewed dimension). ----------------------
    "join_salted" -> QueryDef(
      (s, d) => {
        import graft.core.{Exact, Skew}
        Skew.saltedJoin(
            Tables.lineitem(s, d).select(col("l_suppkey"), col("l_quantity")),
            Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
            "l_suppkey", "s_suppkey", factor = 8)
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n_lines"),
            sum(Exact.money(col("l_quantity"))).cast("double").as("qty"))
          .orderBy(col("s_name"))
      },
      """SELECT s_name, COUNT(*) AS n_lines,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS qty
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin),

    // ---- J7 interval OVERLAP join, grid-blocked: pairs of one
    //      customer's orders whose service windows ([orderdate,
    //      orderdate + okey%5 days]) overlap. The naive form is an
    //      interval×interval theta join; here each interval explodes to
    //      the 7-day grid cells it covers (≤ 2 cells — interval length
    //      < grid pitch), candidates meet on the (custkey, cell)
    //      EQUI-key, the exact overlap predicate filters residually,
    //      and distinct() collapses pairs found in both shared cells —
    //      the geo_join_radius blocking discipline on the time axis.
    //      Complete by construction: overlapping intervals share at
    //      least one covered grid cell. At 100 TB candidates are
    //      bounded by per-(customer, week) activity, never all-pairs --
    "join_interval_grid" -> QueryDef(
      (s, d) => {
        val iv = Tables.orders(s, d).select(
            col("o_custkey").as("cust"), col("o_orderkey").as("okey"),
            datediff(to_date(col("o_orderdate")),
              lit("1970-01-01").cast("date")).cast("long").as("lo"))
          .withColumn("hi", col("lo") + col("okey") % 5)
        val cells = iv.select(col("cust"), col("okey"), col("lo"), col("hi"),
          explode(expr("sequence(lo div 7, hi div 7)")).as("cell"))
        cells.as("a").join(cells.as("b"),
            col("a.cust") === col("b.cust") && col("a.cell") === col("b.cell") &&
              col("a.okey") < col("b.okey") &&
              col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
          .select(col("a.cust").as("o_custkey"),
            col("a.okey").as("okey_a"), col("b.okey").as("okey_b"),
            (least(col("a.hi"), col("b.hi")) -
              greatest(col("a.lo"), col("b.lo")) + 1).as("overlap_days"))
          .distinct()
          .orderBy(col("o_custkey"), col("okey_a"), col("okey_b"))
      },
      """WITH iv AS (
        |  SELECT o_custkey AS cust, o_orderkey AS okey,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo,
        |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      + o_orderkey % 5 AS hi
        |  FROM orders)
        |SELECT a.cust AS o_custkey, a.okey AS okey_a, b.okey AS okey_b,
        |  CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo) + 1 AS BIGINT)
        |    AS overlap_days
        |FROM iv a JOIN iv b
        |  ON a.cust = b.cust AND a.okey < b.okey
        | AND a.lo <= b.hi AND b.lo <= a.hi
        |ORDER BY o_custkey, okey_a, okey_b""".stripMargin)
  )

  /** Bloom-prefiltered shuffle join — the semi-join reduction pattern
    * for the dim-too-big-to-broadcast, keys-fit-a-Bloom regime: build
    * EXACT bit words over the (filtered) dimension's join keys — one
    * bounded collect of mBits/64 longs, the kmeans-centroid precedent —
    * and test every fact row against the literal word array in a NARROW
    * map BEFORE the join's shuffle. Two md5 positions per key, identical
    * derivation both sides of the build/probe; false positives are
    * removed by the exact join that follows, so the rewrite is
    * semantics-preserving and (like `join_salted`) its declared oracle
    * is the PLAIN SQL join — the gate proves the prefilter loses
    * nothing. At 100 TB the win is shuffle bytes: only fact rows whose
    * key might match ever leave the map side. The shuffle_hash hint
    * keeps the demo on the shuffle path the pattern exists for. */
  def bloomPrefilteredJoin(lineitem: DataFrame, supplier: DataFrame,
      mBits: Int = 4096): DataFrame = {
    val dim = supplier.filter(col("s_acctbal") > 5000)
      .select(col("s_suppkey"), col("s_name"))
    // xxhash64, not md5: the bloom filter is ENGINE-side plumbing (the
    // declared oracle is the plain join — the gate proves the prefilter
    // loses nothing), so the portable-hash discipline does not apply,
    // and the md5 string-concat + hex-conv probe cost ~1.4 s of
    // single-core CPU per execution at sf0.1 (two digests per fact
    // row, pushed below the scan re-spread by filter pushdown).
    // xxhash64 is whole-stage-codegen'd and ~20x cheaper; pmod because
    // xxhash64 is signed where the md5 conv was non-negative.
    def positions(key: Column): Seq[Column] = (0 until 2).map { i =>
      pmod(xxhash64(lit(s"jb$i:"), key), lit(mBits.toLong))
    }
    val byWord = dim
      .select(explode(array(positions(col("s_suppkey")): _*)).as("pos"))
      .select(expr("pos div 64").as("wi"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("w"))
      .groupBy(col("wi")).agg(bit_or(col("w")).as("bits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val words = (0 until mBits / 64).map(i => byWord.getOrElse(i, 0L))
    val probe = lineitem
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .withColumn("bw", typedlit(words))
      .withColumn("p0", positions(col("l_suppkey"))(0))
      .withColumn("p1", positions(col("l_suppkey"))(1))
      .filter(expr(
        """(shiftright(element_at(bw, CAST(p0 div 64 AS INT) + 1),
          |            CAST(p0 % 64 AS INT)) & 1) = 1
          |AND (shiftright(element_at(bw, CAST(p1 div 64 AS INT) + 1),
          |                CAST(p1 % 64 AS INT)) & 1) = 1""".stripMargin))
      .drop("bw", "p0", "p1")
    probe.join(dim.hint("shuffle_hash"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_lines"),
        // the scale-4 product sum rounds to cents HALF_UP via the
        // decimal(38,2) cast BEFORE ×100 (a bare long cast would
        // truncate where DuckDB rounds — the vat_summary_decimal rule)
        (sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast("decimal(38,2)") * 100).cast("long").as("revenue_cents"))
      .orderBy(col("s_name"))
  }

  val bloomPrefilteredJoinSql: String =
    """SELECT s_name, COUNT(*) AS n_lines,
      |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |        * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))), 2)
      |       * 100 AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |WHERE s_acctbal > 5000
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  /** Point-in-time (feature-store) join — the as-of composition a
    * training-set builder runs: for every label row (purchase), a
    * feature VECTOR drawn from several streams with strict
    * point-in-time correctness (nothing at-or-after the label's
    * (ts, event_id) leaks in): last prior view value, last prior
    * click value, signup-seen flag (strictly-prior ROWS frame,
    * `last(..., ignoreNulls)` over the shared user-keyed sort) and a
    * 30-minute trailing error count (RANGE frame on exact
    * microseconds, same-timestamp peers included by definition —
    * stated identically in the oracle). ONE shuffle on user_id total,
    * however many features ride the pass — the merge_asof shape
    * extended from one column to the feature vector; the range-framed
    * count shares the exchange and only re-sorts within partitions. */
  def pitFeatures(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-1800000000L, 0L)
    events
      .withColumn("f_last_view_value",
        last(when(col("event_type") === "view", col("value")), true)
          .over(byUser))
      .withColumn("f_last_click_value",
        last(when(col("event_type") === "click", col("value")), true)
          .over(byUser))
      .withColumn("f_signed_up",
        coalesce(max(when(col("event_type") === "signup", true))
          .over(byUser), lit(false)))
      .withColumn("f_errors_30m",
        coalesce(sum(when(col("event_type") === "error", 1L))
          .over(byTime), lit(0L)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("f_last_view_value"),
        col("f_last_click_value"), col("f_signed_up"), col("f_errors_30m"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val pitFeaturesSql: String =
    """SELECT e1.event_id, e1.user_id,
      |  (SELECT e2.value FROM events e2
      |   WHERE e2.user_id = e1.user_id AND e2.event_type = 'view'
      |     AND (e2.ts < e1.ts OR (e2.ts = e1.ts AND e2.event_id < e1.event_id))
      |   ORDER BY e2.ts DESC, e2.event_id DESC LIMIT 1) AS f_last_view_value,
      |  (SELECT e2.value FROM events e2
      |   WHERE e2.user_id = e1.user_id AND e2.event_type = 'click'
      |     AND (e2.ts < e1.ts OR (e2.ts = e1.ts AND e2.event_id < e1.event_id))
      |   ORDER BY e2.ts DESC, e2.event_id DESC LIMIT 1) AS f_last_click_value,
      |  EXISTS (SELECT 1 FROM events e2
      |   WHERE e2.user_id = e1.user_id AND e2.event_type = 'signup'
      |     AND (e2.ts < e1.ts OR (e2.ts = e1.ts AND e2.event_id < e1.event_id)))
      |    AS f_signed_up,
      |  (SELECT COUNT(*) FROM events e2
      |   WHERE e2.user_id = e1.user_id AND e2.event_type = 'error'
      |     AND e2.ts <= e1.ts
      |     AND e2.ts >= e1.ts - INTERVAL 30 MINUTE) AS f_errors_30m
      |FROM events e1
      |WHERE e1.event_type = 'purchase'
      |ORDER BY e1.user_id, e1.event_id""".stripMargin

  /** Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other instead of vanishing — the semantics a conformed
    * dimension with "unknown" members needs (a plain `=` silently drops
    * every unknown-to-unknown row, the classic fact-table leak). Both
    * sides derive NULL keys via NULLIF on the shared {'O','F'} status
    * domain; surfaced per matched key: both sides' counts, plus the
    * count a PLAIN join would have produced (0 for the NULL row — the
    * leak made visible). The join runs on two partial-agg key tables
    * (each ≤ |status domain| rows). Output order pins NULLS FIRST in
    * both engines. */
  def nullSafeJoin(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val l = lineitem
      .groupBy(expr("nullif(l_linestatus, 'F')").as("k"))
      .agg(count(lit(1)).as("l_cnt"))
    val r = orders
      .groupBy(expr("nullif(o_orderstatus, 'F')").as("k2"))
      .agg(count(lit(1)).as("r_cnt"))
    l.join(r, col("k") <=> col("k2"))
      .select(col("k"), col("l_cnt"), col("r_cnt"),
        when(col("k").isNotNull, col("l_cnt") * col("r_cnt"))
          .otherwise(lit(0L)).as("plain_join_rows"))
      .orderBy(col("k").asc_nulls_first)
  }

  val nullSafeJoinSql: String =
    """WITH l AS (
      |  SELECT nullif(l_linestatus, 'F') AS k, COUNT(*) AS l_cnt
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT nullif(o_orderstatus, 'F') AS k2, COUNT(*) AS r_cnt
      |  FROM orders GROUP BY 1)
      |SELECT l.k, l.l_cnt, r.r_cnt,
      |  CASE WHEN l.k IS NOT NULL
      |       THEN l.l_cnt * r.r_cnt ELSE 0 END AS plain_join_rows
      |FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k2
      |ORDER BY l.k NULLS FIRST""".stripMargin

  def queries: Seq[(String, QueryDef)] = q ++ Seq(
    "join_nullsafe" -> QueryDef(
      (s, d) => nullSafeJoin(Tables.lineitem(s, d), Tables.orders(s, d)),
      nullSafeJoinSql),
    "join_pit_features" -> QueryDef(
      (s, d) => pitFeatures(Tables.events(s, d)),
      pitFeaturesSql),
    "join_bloom" -> QueryDef(
      (s, d) => bloomPrefilteredJoin(Tables.lineitem(s, d),
        Tables.supplier(s, d)),
      bloomPrefilteredJoinSql))
}
