package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, QueryDef, Tables}

/** Distributional-shape aggregates: inequality (Gini coefficient) and
  * label purity (Gini impurity). [EXT] — the reference aggregates sums
  * and counts (fianl2.py:171-187); a curation pipeline also needs the
  * SHAPE of a distribution: how concentrated spend is inside a segment
  * (sampling-weight design), how mixed a source's language labels are
  * (routing/filter design).
  *
  * Both surfaces are exact integers end to end (the engine-wide
  * oracle-gate discipline): money enters as DECIMAL-derived whole
  * dollars, every score is one integer floor-division of two BIGINT
  * products — bit-identical cross-engine, stable under repartitioning.
  */
object Distribution {

  /** Gini coefficient of per-customer spend inside each market segment,
    * in basis points (10000 = perfect concentration).
    *
    * Identity used: with per-customer spends sorted ascending
    * x_1..x_n, G = Σ_i (2i − n − 1)·x_i / (n·Σx). Summed over a
    * DISTINCT spend value v with multiplicity c whose sorted positions
    * are F+1..F+c (F = customers with smaller spend), the coefficient
    * telescopes to v·c·(2F + c − n) — so the ranking window runs over
    * the (segment, distinct-value) relation, not per customer:
    * cardinality is bounded by distinct spend levels, the aggregation
    * from customers is a plain partial-agg groupBy, and tie order
    * inside a value is irrelevant by construction (no fat-key
    * per-customer window). Spend is whole dollars (exact DECIMAL
    * floor), keeping every product ≤ n·T far below BIGINT range at
    * bench scales; the 38-digit-decimal widening is the documented
    * path beyond ~10^8 customers/segment.
    */
  def giniBySegment(orders: DataFrame, customer: DataFrame): DataFrame = {
    val spend = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
      // whole dollars via exact integer division: sum cents, then div
      // 100 (`div`, not `/`: Spark's `/` on longs is double division +
      // cast, which is only exact below ~9e13 cents — `div` is exact at
      // any magnitude and truncates toward zero, identical to DuckDB's
      // `//`; operands here are non-negative, so truncation = floor)
      .agg(sum((Exact.money(col("o_totalprice")) * 100).cast("long"))
        .as("sum_cents"))
      .select(col("seg"), expr("sum_cents div 100").as("x"))
    val byValue = spend.groupBy(col("seg"), col("x"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("seg")).orderBy(col("x"))
    val ranked = byValue
      .withColumn("f", coalesce(sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    ranked
      .groupBy(col("seg"))
      .agg(sum(col("c")).as("n"),
        sum(col("x") * col("c")).as("total"),
        sum(col("x") * col("c") * (lit(2) * col("f") + col("c"))).as("wsum"))
      // Σ x·c·(2F + c − n) = wsum − n·total; G_bp = 1e4·num div (n·T)
      .select(col("seg"), col("n"), col("total"),
        expr("((wsum - n * total) * 10000L) div (n * total)").as("gini_bp"))
      .orderBy(col("seg"))
  }

  val giniBySegmentSql: String =
    """WITH spend AS (
      |  SELECT c.c_mktsegment AS seg, c.c_custkey,
      |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |         // 100 AS BIGINT) AS x
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_mktsegment, c.c_custkey),
      |by_value AS (
      |  SELECT seg, x, COUNT(*) AS c FROM spend GROUP BY seg, x),
      |ranked AS (
      |  SELECT seg, x, c,
      |    COALESCE(SUM(c) OVER (PARTITION BY seg ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
      |  FROM by_value)
      |-- DuckDB SUM(BIGINT) widens to HUGEINT (fetched as float64) while
      |-- Spark stays int64 — cast every aggregate-derived output back to
      |-- BIGINT so the driver's representation hash matches
      |SELECT seg, CAST(SUM(c) AS BIGINT) AS n,
      |  CAST(SUM(x * c) AS BIGINT) AS total,
      |  CAST(((SUM(x * c * (2 * f + c)) - SUM(c) * SUM(x * c)) * 10000)
      |    // (SUM(c) * SUM(x * c)) AS BIGINT) AS gini_bp
      |FROM ranked GROUP BY seg
      |ORDER BY seg""".stripMargin

  /** Gini impurity of the language-label distribution per document
    * source: impurity_ppm = (n² − Σ_lang c²)·10^6 div n², plus the
    * majority label and its share. The split-quality measure a
    * label-routing or filter stage reads before trusting a source's
    * language tags — 0 means single-label, →10^6·(1−1/k) means uniform
    * over k labels. Two partial-agg groupBys (source×lang, then
    * source); the majority label via max_by with lexical tie-break
    * folded into the same pass (struct max over (count, reversed-rank
    * lang) is order-deterministic). */
  def labelImpurity(docs: DataFrame): DataFrame = {
    val byLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val agg = byLang.groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        sum(col("c") * col("c")).as("c2"),
        max(col("c")).as("max_c"))
    // majority label, smallest lang string on count ties — a window over
    // the vocabulary-small (source, lang) relation, never the documents
    val top = byLang.withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("c").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    agg.join(top, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_langs"), col("top_lang"),
        expr("max_c * 10000L div n_docs").as("top_share_bp"),
        expr("(n_docs * n_docs - c2) * 1000000L div (n_docs * n_docs)")
          .as("impurity_ppm"))
      .orderBy(col("source"))
  }

  val labelImpuritySql: String =
    """WITH by_lang AS (
      |  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY source, lang),
      |agg AS (
      |  -- CAST the SUMs back: DuckDB widens SUM(BIGINT) to HUGEINT,
      |  -- which the driver fetches as float64 vs Spark's int64
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs, COUNT(*) AS n_langs,
      |    CAST(SUM(c * c) AS BIGINT) AS c2, MAX(c) AS max_c
      |  FROM by_lang GROUP BY source),
      |top AS (
      |  SELECT source, lang AS top_lang FROM (
      |    SELECT source, lang,
      |      ROW_NUMBER() OVER (PARTITION BY source
      |        ORDER BY c DESC, lang) AS rk
      |    FROM by_lang) WHERE rk = 1)
      |SELECT a.source, a.n_docs, a.n_langs, t.top_lang,
      |  CAST(a.max_c * 10000 // a.n_docs AS BIGINT) AS top_share_bp,
      |  CAST((a.n_docs * a.n_docs - a.c2) * 1000000
      |    // (a.n_docs * a.n_docs) AS BIGINT) AS impurity_ppm
      |FROM agg a JOIN top t ON t.source = a.source
      |ORDER BY a.source""".stripMargin

  /** Pareto concentration readout: what share of total spend do the
    * top 20% of customers carry (the 80/20 check next to [[agg_gini]]'s
    * full-curve coefficient). m = ceil(n/5) exactly; the top-m sum
    * comes from the DESCENDING distinct-value cumulative — count and
    * mass windows over |distinct spend| rows, a partial take of
    * (m − count_above) customers at the boundary value — so no global
    * per-customer sort exists anywhere. Single-row artifact, all
    * BIGINT, share as floor basis points. */
  def paretoShare(orders: DataFrame): DataFrame = {
    val spend = orders
      .groupBy(col("o_custkey"))
      .agg(sum((Exact.money(col("o_totalprice")) * 100).cast("long")).as("x"))
    val byValue = spend.groupBy(col("x")).agg(count(lit(1)).as("c"))
    val wDesc = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = byValue.agg(sum(col("c")).as("n"),
      sum(col("x") * col("c")).as("total"))
    byValue
      .select(col("x"), col("c"),
        coalesce(sum(col("c")).over(wDesc), lit(0L)).as("cnt_above"),
        coalesce(sum(col("x") * col("c")).over(wDesc), lit(0L))
          .as("mass_above"))
      .crossJoin(broadcast(tot))
      .withColumn("m", expr("(n + 4) div 5"))
      .filter(col("cnt_above") < col("m"))
      .orderBy(col("x"))
      .limit(1)
      .select(col("n"), col("m"), col("total").as("total_cents"),
        (col("mass_above") +
          least(col("c"), col("m") - col("cnt_above")) * col("x"))
          .as("top_cents"))
      .select(col("n"), col("m"), col("total_cents"), col("top_cents"),
        expr("top_cents * 10000L div total_cents").as("share_bp"))
  }

  val paretoShareSql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |         AS BIGINT) AS x
      |  FROM orders GROUP BY o_custkey),
      |by_value AS (SELECT x, COUNT(*) AS c FROM spend GROUP BY x),
      |cum AS (
      |  SELECT x, c,
      |    CAST(COALESCE(SUM(c) OVER (ORDER BY x DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cnt_above,
      |    CAST(COALESCE(SUM(x * c) OVER (ORDER BY x DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS mass_above
      |  FROM by_value),
      |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
      |             CAST(SUM(x * c) AS BIGINT) AS total FROM by_value),
      |boundary AS (
      |  SELECT cum.*, t.n, t.total, (t.n + 4) // 5 AS m
      |  FROM cum CROSS JOIN t
      |  WHERE cum.cnt_above < (t.n + 4) // 5
      |  ORDER BY cum.x ASC LIMIT 1)
      |SELECT n, m, total AS total_cents,
      |  mass_above + least(c, m - cnt_above) * x AS top_cents,
      |  (mass_above + least(c, m - cnt_above) * x) * 10000 // total
      |    AS share_bp
      |FROM boundary""".stripMargin

  /** Winsorized mean of the price column — the robust location
    * estimate an outlier-ridden 100 TB drop needs before plain AVG
    * means anything: values below the p5 / above the p95 rank cut are
    * CLAMPED to the cut values (winsorizing keeps mass, trimming drops
    * it), cuts found on the distinct-value cumulative (the A15/A16
    * relation — never a global per-row sort), clamped sum is
    * Σ clamp(v)·cnt in exact cents, mean one floor division. Rank
    * semantics: cut_lo = smallest v with cum_count ≥ ceil(n/20),
    * cut_hi = smallest v with cum_count ≥ ceil(19n/20) — deterministic
    * under ties by construction. */
  def winsorizedMean(lineitem: DataFrame): DataFrame = {
    val cents = lineitem.select(
      (Exact.money(col("l_extendedprice")) * 100).cast("long").as("v"))
    val byValue = cents.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byValue
      .select(col("v"), col("c"), sum(col("c")).over(w).as("cum"))
    val tot = byValue.agg(sum(col("c")).as("n"))
    // BOTH rank cuts in ONE conditional-min pass over the cumulative
    // (lo = min v with cum ≥ ceil(n/20), hi = min v with cum ≥
    // ceil(19n/20) — identical semantics to filtering twice), with n
    // riding along so the final select needs a single broadcast row.
    // The previous two filter+agg arms each planned their OWN broadcast
    // subtree, and broadcast subtrees don't share exchanges — the
    // single-partition cumulative Window (this operator's documented
    // serial stage) executed TWICE and the lineitem scan SIX times
    // (plans/r17/agg_winsorized_before.txt).
    val cuts = cum.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n + 19) div 20"), col("v"))).as("lo"),
        min(when(col("cum") >= expr("(19 * n + 19) div 20"), col("v")))
          .as("hi"))
    byValue.crossJoin(broadcast(cuts))
      .select(col("n"), col("lo"), col("hi"),
        (least(greatest(col("v"), col("lo")), col("hi")) * col("c"))
          .as("wmass"),
        (col("v") * col("c")).as("mass"))
      .groupBy(col("n"), col("lo"), col("hi"))
      .agg(sum(col("wmass")).as("winsorized_cents"),
        sum(col("mass")).as("raw_cents"))
      .select(col("n"), col("lo").as("lo_cut_cents"),
        col("hi").as("hi_cut_cents"),
        col("winsorized_cents"), col("raw_cents"),
        expr("winsorized_cents div n").as("winsorized_mean_cents"),
        expr("raw_cents div n").as("raw_mean_cents"))
  }

  val winsorizedMeanSql: String =
    """WITH cents AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |    AS v FROM lineitem),
      |by_value AS (SELECT v, COUNT(*) AS c FROM cents GROUP BY v),
      |cum AS (
      |  SELECT v, c,
      |    CAST(SUM(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM by_value),
      |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM by_value),
      |lo AS (SELECT MIN(v) AS lo FROM cum CROSS JOIN t
      |       WHERE cum >= (n + 19) // 20),
      |hi AS (SELECT MIN(v) AS hi FROM cum CROSS JOIN t
      |       WHERE cum >= (19 * n + 19) // 20)
      |SELECT t.n, lo.lo AS lo_cut_cents, hi.hi AS hi_cut_cents,
      |  CAST(SUM(least(greatest(v, lo.lo), hi.hi) * c) AS BIGINT)
      |    AS winsorized_cents,
      |  CAST(SUM(v * c) AS BIGINT) AS raw_cents,
      |  CAST(SUM(least(greatest(v, lo.lo), hi.hi) * c) AS BIGINT) // t.n
      |    AS winsorized_mean_cents,
      |  CAST(SUM(v * c) AS BIGINT) // t.n AS raw_mean_cents
      |FROM by_value CROSS JOIN t CROSS JOIN lo CROSS JOIN hi
      |GROUP BY t.n, lo.lo, hi.hi""".stripMargin

  /** Hoover (Robin Hood) index per market segment: the share of total
    * spend that would have to move to equalize everyone — H =
    * Σ|x_i − μ| / (2·Σx), held exact by cross-multiplication:
    * H_bp = 10000·Σ c·|n·x − s| div (2·n·s) over the DISTINCT-value
    * relation (the A15 trick — multiplicity c folds all tied customers
    * into one term, no per-customer window anywhere). The numerator can
    * graze BIGINT at fat segments (n·x products), so the scaled final
    * product goes through DECIMAL(38,0), whose DuckDB twin is the
    * automatic HUGEINT promotion. Complements A15: Gini weighs the
    * whole curve, Hoover reads the single worst transfer. */
  def hooverBySegment(orders: DataFrame, customer: DataFrame): DataFrame = {
    val spend = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
      .agg(sum((Exact.money(col("o_totalprice")) * 100).cast("long")).as("x"))
    val byValue = spend.groupBy(col("seg"), col("x"))
      .agg(count(lit(1)).as("c"))
    val tot = byValue.groupBy(col("seg"))
      .agg(sum(col("c")).as("n"), sum(col("x") * col("c")).as("s"))
    byValue.join(broadcast(tot), Seq("seg"))
      .groupBy(col("seg"), col("n"), col("s"))
      .agg(sum(col("c") * abs(col("n") * col("x") - col("s"))).as("num"))
      .select(col("seg"), col("n"), col("s").as("total_cents"),
        expr("CAST(CAST(num AS DECIMAL(38,0)) * 10000 div " +
          "(2 * CAST(n AS DECIMAL(38,0)) * s) AS BIGINT)").as("hoover_bp"))
      .orderBy(col("seg"))
  }

  val hooverBySegmentSql: String =
    """WITH spend AS (
      |  SELECT c.c_mktsegment AS seg, c.c_custkey,
      |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |         AS BIGINT) AS x
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_mktsegment, c.c_custkey),
      |by_value AS (
      |  SELECT seg, x, COUNT(*) AS c FROM spend GROUP BY seg, x),
      |tot AS (
      |  SELECT seg, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(x * c) AS BIGINT) AS s
      |  FROM by_value GROUP BY seg)
      |-- SUM promotes to HUGEINT, matching the Spark DECIMAL(38,0) hop
      |SELECT b.seg, t.n, t.s AS total_cents,
      |  CAST(SUM(b.c * abs(t.n * b.x - t.s)) * 10000
      |       // (2 * t.n * t.s) AS BIGINT) AS hoover_bp
      |FROM by_value b JOIN tot t ON t.seg = b.seg
      |GROUP BY b.seg, t.n, t.s
      |ORDER BY b.seg""".stripMargin

  /** Trimmed mean — A17's sibling that DROPS the tails instead of
    * clamping them: the middle 90% by rank, with tie clumps at the cut
    * boundaries included PARTIALLY and exactly — a value with
    * cumulative range (cum−c, cum] contributes
    * max(0, min(cum, hi) − max(cum−c, lo)) ranks, so the kept mass is
    * rank-exact whatever the tie structure (most implementations
    * silently keep or drop whole clumps). Ranks lo = ceil(n/20) drop
    * from the bottom, ranks above hi = floor(19n/20) from the top.
    * Same distinct-value cumulative as A15–A17; all BIGINT. */
  def trimmedMean(lineitem: DataFrame): DataFrame = {
    val cents = lineitem.select(
      (Exact.money(col("l_extendedprice")) * 100).cast("long").as("v"))
    val byValue = cents.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byValue
      .select(col("v"), col("c"), sum(col("c")).over(w).as("cum"))
    val tot = byValue.agg(sum(col("c")).as("n"))
    cum.crossJoin(broadcast(tot))
      .withColumn("lo", expr("(n + 19) div 20"))
      .withColumn("hi", expr("(19 * n) div 20"))
      .withColumn("kept", greatest(lit(0L),
        least(col("cum"), col("hi")) -
          greatest(col("cum") - col("c"), col("lo"))))
      .groupBy(col("n"), col("lo"), col("hi"))
      .agg(sum(col("kept")).as("kept_ranks"),
        sum(col("kept") * col("v")).as("trimmed_cents"))
      .select(col("n"), col("lo"), col("hi"), col("kept_ranks"),
        col("trimmed_cents"),
        expr("trimmed_cents div kept_ranks").as("trimmed_mean_cents"))
  }

  val trimmedMeanSql: String =
    """WITH cents AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |    AS v FROM lineitem),
      |by_value AS (SELECT v, COUNT(*) AS c FROM cents GROUP BY v),
      |cum AS (
      |  SELECT v, c,
      |    CAST(SUM(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM by_value),
      |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM by_value),
      |k AS (
      |  SELECT cum.*, t.n, (t.n + 19) // 20 AS lo, (19 * t.n) // 20 AS hi,
      |    GREATEST(0, LEAST(cum, (19 * t.n) // 20)
      |      - GREATEST(cum - c, (t.n + 19) // 20)) AS kept
      |  FROM cum CROSS JOIN t)
      |SELECT n, lo, hi, CAST(SUM(kept) AS BIGINT) AS kept_ranks,
      |  CAST(SUM(kept * v) AS BIGINT) AS trimmed_cents,
      |  CAST(SUM(kept * v) AS BIGINT) // CAST(SUM(kept) AS BIGINT)
      |    AS trimmed_mean_cents
      |FROM k GROUP BY n, lo, hi""".stripMargin

  def queries: Seq[(String, QueryDef)] = Seq(
    "agg_trimmed_mean" -> QueryDef(
      (s: SparkSession, d: String) => trimmedMean(Tables.lineitem(s, d)),
      trimmedMeanSql),
    "agg_hoover" -> QueryDef(
      (s: SparkSession, d: String) =>
        hooverBySegment(Tables.orders(s, d), Tables.customer(s, d)),
      hooverBySegmentSql),
    "agg_winsorized" -> QueryDef(
      (s: SparkSession, d: String) => winsorizedMean(Tables.lineitem(s, d)),
      winsorizedMeanSql),
    "agg_pareto_share" -> QueryDef(
      (s: SparkSession, d: String) => paretoShare(Tables.orders(s, d)),
      paretoShareSql),
    "agg_gini" -> QueryDef(
      (s: SparkSession, d: String) =>
        giniBySegment(Tables.orders(s, d), Tables.customer(s, d)),
      giniBySegmentSql),
    "classify_gini_impurity" -> QueryDef(
      (s: SparkSession, d: String) => labelImpurity(Tables.documents(s, d)),
      labelImpuritySql))
}
