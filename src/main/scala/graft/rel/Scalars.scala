package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Exact, QueryDef, Tables}

/** Scalar-function corpus (SURVEY.md §2.8 F13) + generalized predicates
  * (P7) + reshape (R3 pivot / A8 rollup & cube).
  *
  * Function choices are pinned to pairs with identical cross-engine
  * semantics (e.g. `sqrt` is IEEE-correctly-rounded in both; `pow`/`exp`
  * are not and are exercised in ScalaTest instead of the oracle; `round`
  * on doubles differs at exact midpoints between HALF_UP and HALF_EVEN so
  * rounding happens in DECIMAL space only).
  */
object Scalars {
  import Exact._

  private val q: Seq[(String, QueryDef)] = Seq(

    // ---- F13 string functions -------------------------------------------
    "scalar_string" -> QueryDef(
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        element_at(split(col("p_name"), " "), 1).as("first_token"))
        .orderBy(col("p_partkey")),
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper, lower(p_brand) AS brand_lower,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  replace(p_name, ' ', '_') AS name_snake,
        |  string_split(p_name, ' ')[1] AS first_token
        |FROM part ORDER BY p_partkey""".stripMargin),

    // ---- F13 math functions ---------------------------------------------
    "scalar_math" -> QueryDef(
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000).as("price_k_floor"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        (col("l_orderkey") % 7).as("key_mod7"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        signum(col("l_quantity") - 25).as("qty_sign"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS qty_dev,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  l_orderkey % 7 AS key_mod7,
        |  greatest(l_discount, l_tax) AS max_rate,
        |  least(l_discount, l_tax) AS min_rate,
        |  CAST(sign(l_quantity - 25) AS DOUBLE) AS qty_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // ---- F13/F9 date & time functions -----------------------------------
    "scalar_datetime" -> QueryDef(
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mth"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow_sun1"),
        trunc(col("o_orderdate"), "month").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .as("days_since_95"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"))
        .orderBy(col("o_orderkey")),
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(month(o_orderdate) AS INT) AS mth,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // ---- F13 JSON extraction (events.props is a JSON string) ------------
    "scalar_json" -> QueryDef(
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"))
        .orderBy(col("event_id")),
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin),

    // ---- F13 array functions (token arrays; binary string collation is
    //      identical cross-engine, so sort/min/max of tokens agree) -------
    "scalar_arrays" -> QueryDef(
      (s, d) => {
        val toks = filter(split(col("text"), " "), t => t =!= "")
        Tables.documents(s, d).select(
          col("doc_id"),
          size(toks).as("n_toks"),
          array_join(slice(toks, 1, 3), " ").as("first3"),
          element_at(toks, -1).as("last_tok"),
          element_at(array_sort(toks), 1).as("min_tok"),
          array_max(toks).as("max_tok"),
          array_contains(toks, "the").as("has_the"),
          size(array_intersect(toks, typedlit(Seq("the", "a", "and", "of"))))
            .as("n_stop_kinds"))
          .orderBy(col("doc_id"))
      },
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_toks,
        |  array_to_string(toks[1:3], ' ') AS first3,
        |  toks[-1] AS last_tok,
        |  list_sort(toks)[1] AS min_tok,
        |  list_max(toks) AS max_tok,
        |  list_contains(toks, 'the') AS has_the,
        |  CAST(len(list_distinct(list_filter(toks,
        |    x -> x IN ('the','a','and','of')))) AS INT) AS n_stop_kinds
        |FROM t ORDER BY doc_id""".stripMargin),

    // ---- F13 regex functions (RE2-safe patterns; all patterns chosen to
    //      always match, so no-match return conventions never diverge) ----
    "scalar_regex" -> QueryDef(
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        col("p_name").rlike("red|blue|green").as("has_color"),
        size(expr("regexp_extract_all(p_name, '[aeiou]+', 0)")).as("vowel_runs"),
        regexp_replace(col("p_type"), "[aeiouAEIOU]", "").as("type_novowels"),
        size(split(col("p_type"), " ")).as("n_type_words"))
        .orderBy(col("p_partkey")),
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  regexp_matches(p_name, 'red|blue|green') AS has_color,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT) AS vowel_runs,
        |  regexp_replace(p_type, '[aeiouAEIOU]', '', 'g') AS type_novowels,
        |  CAST(len(string_split(p_type, ' ')) AS INT) AS n_type_words
        |FROM part ORDER BY p_partkey""".stripMargin),

    // ---- F13 URL decomposition: Spark's Hive-style parse_url vs a
    //      regexp re-derivation in the oracle (DuckDB has no parse_url)
    //      — pins that the engine's URL semantics are the portable
    //      ones; URLs built deterministically from event columns so
    //      every component arm fires ---------------------------------------
    "scalar_url" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          concat(lit("https://shop.example.com/"), col("event_type"),
            lit("/"), (col("user_id") % 10).cast("string"),
            lit("?uid="), col("user_id").cast("string"), lit("&v=1"))
            .as("url"))
        .select(col("event_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'QUERY', 'uid')").as("uid"),
          expr("parse_url(url, 'PROTOCOL')").as("scheme"))
        .orderBy(col("event_id")),
      """SELECT event_id,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, '[?&]uid=([^&#]*)', 1) AS uid,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS scheme
        |FROM (
        |  SELECT event_id,
        |    'https://shop.example.com/' || event_type || '/' ||
        |    CAST(user_id % 10 AS VARCHAR) || '?uid=' ||
        |    CAST(user_id AS VARCHAR) || '&v=1' AS url
        |  FROM events)
        |ORDER BY event_id""".stripMargin),

    // ---- P7 predicates: CASE / IN / BETWEEN / LIKE / IS NULL ------------
    "scalar_predicates" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .select(
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice").between(100000, 300000), "mid")
            .otherwise("high").as("price_band"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
            .otherwise("cold").as("prio_class"),
          col("o_orderpriority").like("%URGENT%").as("is_urgent"))
        .groupBy(col("price_band"), col("prio_class"), col("is_urgent"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("price_band"), col("prio_class"), col("is_urgent")),
      """SELECT
        |  CASE WHEN o_totalprice < 100000 THEN 'low'
        |       WHEN o_totalprice BETWEEN 100000 AND 300000 THEN 'mid'
        |       ELSE 'high' END AS price_band,
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot'
        |       ELSE 'cold' END AS prio_class,
        |  o_orderpriority LIKE '%URGENT%' AS is_urgent,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY 1, 2, 3
        |ORDER BY price_band, prio_class, is_urgent""".stripMargin),

    // ---- R3 pivot (long→wide) -------------------------------------------
    "pivot_status" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
        .withColumnRenamed("P", "n_p")
        .orderBy(col("o_orderpriority")),
      """SELECT o_orderpriority,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ---- R1/R2 via the NATIVE unpivot API (Spark 3.4+ Dataset.unpivot;
    //      the VAT summary's reshape uses inline(array(struct)) because
    //      it unpivots post-aggregate columns — this covers the built-in
    //      surface a user reaches for first). Wide part metrics → long
    //      (metric, value) rows; Expand node, single scan. ---------------
    "reshape_unpivot" -> QueryDef(
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_retailprice").as("retail_price"),
          col("p_size").cast("double").as("size_val"))
        .unpivot(
          ids = Array(col("p_partkey")),
          values = Array(col("retail_price"), col("size_val")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .orderBy(col("p_partkey"), col("metric")),
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'retail_price' AS metric, p_retailprice AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size_val', CAST(p_size AS DOUBLE) FROM part)
        |ORDER BY p_partkey, metric""".stripMargin),

    // ---- A8 rollup / cube ------------------------------------------------
    "agg_rollup" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy(col("flag"), col("status")),
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n, CAST(CAST(SUM(l_quantity) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin),

    "agg_cube" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum0(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority")),
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin),

    // ---- A8 grouping sets (via the engine's SQL API) ---------------------
    "agg_grouping_sets" -> QueryDef(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql(
          """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
            |  COALESCE(o_orderpriority, 'ALL') AS priority,
            |  COUNT(1) AS n
            |FROM orders_gs
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
            |ORDER BY status, priority""".stripMargin)
      },
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin),

    // ---- bitwise scalar corpus: &, |, xor, shifts, bit_count — the
    //      integer kernel the z-order/Morton layout and hash families
    //      build on, declared as its own surface ------------------------
    "scalar_bitwise" -> QueryDef(
      (s, d) => {
        val k = col("o_orderkey")
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            k.bitwiseAND(lit(0xFFL)).as("b_and"),
            k.bitwiseOR(lit(0x100L)).as("b_or"),
            k.bitwiseXOR(lit(0x5555L)).as("b_xor"),
            shiftleft(k, 3).as("b_shl"),
            shiftrightunsigned(k, 2).as("b_shr"),
            bit_count(k).as("b_pop"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS b_and,
        |  o_orderkey | 256 AS b_or,
        |  xor(o_orderkey, 21845) AS b_xor,
        |  o_orderkey << 3 AS b_shl,
        |  o_orderkey >> 2 AS b_shr,
        |  CAST(bit_count(o_orderkey) AS INT) AS b_pop
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // ---- grouping()/grouping_id(): the disambiguation functions for
    //      super-aggregate rows — COALESCE-based labels (agg_rollup)
    //      can't tell a real NULL key from a rollup total; grouping()
    //      can, which is the point this query pins --------------------
    "agg_grouping_fn" -> QueryDef(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gf")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority,
            |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
            |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
            |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
            |  COUNT(1) AS n
            |FROM orders_gf
            |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
            |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)
      },
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin),

    // ---- three-valued-logic / null-propagation matrix: the scalar
    //      corpus for NULL semantics (nullif, coalesce, null-safe
    //      equality, NULL in AND/OR, NULL through || and arithmetic) —
    //      pinned on a small dim with nulls INJECTED via nullif so
    //      every arm actually sees one -----------------------------------
    "scalar_nulls" -> QueryDef(
      (s, d) => {
        val maybe = nullif(col("n_nationkey") % 5, lit(0)) // null on multiples of 5
        Tables.nation(s, d)
          .select(col("n_nationkey"),
            maybe.as("injected"),
            coalesce(maybe, lit(-1)).as("coalesced"),
            nullif(col("n_name"), col("n_name")).as("self_nullif"),
            (maybe <=> lit(null)).as("nullsafe_eq_null"),
            (maybe === lit(2)).as("tv_eq"),          // NULL where injected
            ((col("n_nationkey") >= 0) && (maybe === 2)).as("tv_and"),
            ((col("n_nationkey") >= 0) || (maybe === 2)).as("tv_or"),
            concat(lit("k="), maybe.cast("string")).as("null_concat"),
            (maybe + 100).as("null_arith"))
          .orderBy(col("n_nationkey"))
      },
      """SELECT n_nationkey,
        |  nullif(n_nationkey % 5, 0) AS injected,
        |  coalesce(nullif(n_nationkey % 5, 0), -1) AS coalesced,
        |  nullif(n_name, n_name) AS self_nullif,
        |  nullif(n_nationkey % 5, 0) IS NOT DISTINCT FROM NULL AS nullsafe_eq_null,
        |  nullif(n_nationkey % 5, 0) = 2 AS tv_eq,
        |  (n_nationkey >= 0) AND (nullif(n_nationkey % 5, 0) = 2) AS tv_and,
        |  (n_nationkey >= 0) OR (nullif(n_nationkey % 5, 0) = 2) AS tv_or,
        |  'k=' || CAST(nullif(n_nationkey % 5, 0) AS VARCHAR) AS null_concat,
        |  nullif(n_nationkey % 5, 0) + 100 AS null_arith
        |FROM nation ORDER BY n_nationkey""".stripMargin),

    // ---- ordered string aggregation (Spark 4.0 listagg / DuckDB
    //      string_agg): deterministic ONLY with the explicit WITHIN
    //      GROUP order — an unordered listagg is partitioning-dependent
    //      and could never hash-match ------------------------------------
    "agg_listagg" -> QueryDef(
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("nation_la")
        Tables.region(s, d).createOrReplaceTempView("region_la")
        s.sql(
          """SELECT r_name,
            |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
            |FROM nation_la JOIN region_la ON n_regionkey = r_regionkey
            |GROUP BY r_name ORDER BY r_name""".stripMargin)
      },
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  )

  /** Business-day arithmetic — the calendar kernel under every SLA
    * report: weekdays strictly after the order date up to and including
    * the first ship date. Closed form at any span: full weeks × 5 plus
    * a ≤ 6-element HOF over the remainder (never a per-day explode of
    * the whole span); weekday from the epoch-day integer ((d + 3) mod 7,
    * Monday 0 — the E32 convention, no engine dayofweek drift). The SLA
    * verdict (> 10 business days) is part of the hashed surface. */
  def businessDaySla(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val firstShip = lineitem
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("ship_day"))
    orders
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_day"))
      .join(firstShip, Seq("o_orderkey"))
      .withColumn("span", datediff(col("ship_day"), col("order_day"))
        .cast("long"))
      .withColumn("dow1",
        expr("(datediff(order_day, DATE '1970-01-01') + 3) % 7"))
      // the synthetic fixture has UNCORRELATED dates, so ship-before-
      // order happens; a real SLA report flags those rows rather than
      // running the kernel backwards — valid is part of the surface
      .withColumn("busdays",
        expr("""CASE WHEN span >= 0 THEN
             |  span div 7 * 5 + aggregate(
             |    CASE WHEN span % 7 = 0 THEN array()
             |         ELSE sequence(1L, span % 7) END,
             |    0L, (acc, i) ->
             |    acc + IF((dow1 + i) % 7 < 5, 1L, 0L)) END""".stripMargin))
      .select(col("o_orderkey"), col("order_day"), col("ship_day"),
        col("span"), (col("span") >= 0).as("valid"), col("busdays"),
        when(col("span") >= 0, col("busdays") > 10).as("sla_breach"))
      .orderBy(col("o_orderkey"))
  }

  val businessDaySlaSql: String =
    """WITH fs AS (
      |  SELECT l_orderkey AS o_orderkey,
      |    MIN(CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)) AS ship_day
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o.o_orderkey,
      |    CAST(CAST(o.o_orderdate AS TIMESTAMP) AS DATE) AS order_day,
      |    fs.ship_day
      |  FROM orders o JOIN fs USING (o_orderkey)),
      |k AS (
      |  SELECT *,
      |    CAST(date_diff('day', order_day, ship_day) AS BIGINT) AS span,
      |    (date_diff('day', DATE '1970-01-01', order_day) + 3) % 7 AS dow1
      |  FROM j)
      |SELECT o_orderkey, order_day, ship_day, span, span >= 0 AS valid,
      |  CASE WHEN span >= 0 THEN
      |    CAST(span // 7 * 5 + COALESCE(len(list_filter(
      |      CASE WHEN span % 7 = 0 THEN CAST([] AS BIGINT[])
      |           ELSE generate_series(1, CAST(span % 7 AS INT)) END,
      |      i -> (dow1 + i) % 7 < 5)), 0) AS BIGINT) END AS busdays,
      |  CASE WHEN span >= 0 THEN
      |    span // 7 * 5 + COALESCE(len(list_filter(
      |      CASE WHEN span % 7 = 0 THEN CAST([] AS BIGINT[])
      |           ELSE generate_series(1, CAST(span % 7 AS INT)) END,
      |      i -> (dow1 + i) % 7 < 5)), 0) > 10 END AS sla_breach
      |FROM k ORDER BY o_orderkey""".stripMargin

  def queries: Seq[(String, QueryDef)] = q ++ Seq(
    "scalar_busdays" -> QueryDef(
      (s: org.apache.spark.sql.SparkSession, d: String) =>
        businessDaySla(Tables.orders(s, d), Tables.lineitem(s, d)),
      businessDaySlaSql))
}
