package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Exact, QueryDef, Tables}

/** Experimentation & monitoring operators. [EXT] — the reference stops at
  * descriptive aggregates (fianl2.py:171-187); a data platform feeding a
  * 100 TB training pipeline also runs the MEASUREMENT layer: variance
  * reduction for online experiments (CUPED), engagement ratios
  * (stickiness), inter-event timing, volume anomaly monitors on the
  * ingest stream, and sampling-design allocation (Neyman).
  *
  * All comparison surfaces follow the engine-wide exactness discipline:
  * integer fixed point wherever possible; where a statistic is
  * irreducibly real-valued (CUPED's theta), exact BIGINT moments are
  * computed first and the textbook formula runs ONCE in IEEE double on
  * identical integer inputs — every operation correctly rounded, so both
  * engines agree bitwise (the agg_corr_exact discipline,
  * rel/RelQueries.scala:380).
  */
object Experiments {

  // ---------------------------------------------------------------- DAU/MAU

  /** Daily stickiness: DAU / trailing-28-day MAU, in basis points.
    *
    * MAU(d) = distinct users active in [d−27, d], computed by the
    * contribution trick shared with [[EventAnalytics.activeUsers]]: each
    * (user, active-day) pair contributes to the 28 window-days it can
    * see, then one distinct + groupBy — never a day×user cross join and
    * never a 28-day self-join of the daily relation. Cost scales with
    * |distinct user-days|·28, a bounded blow-up of an already-distinct
    * relation, and every stage is a partial-agg groupBy.
    */
  def stickiness(events: DataFrame, w: Int = 28): DataFrame = {
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val mau = userDays
      .select(col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${w - 1}))")).as("win_day"))
      .distinct()
      .groupBy(col("win_day").as("day"))
      .agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("day"))
      .select(col("day"), col("dau"), col("mau"),
        expr("dau * 10000L div mau").as("stickiness_bp"))
      .orderBy(col("day"))
  }

  def stickinessSql(w: Int = 28): String =
    s"""WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
      |mau AS (
      |  SELECT win_day AS day, COUNT(*) AS mau FROM (
      |    SELECT DISTINCT user_id,
      |      CAST(unnest(generate_series(day, day + INTERVAL ${w - 1} DAY,
      |        INTERVAL 1 DAY)) AS DATE) AS win_day
      |    FROM ud) GROUP BY win_day)
      |SELECT d.day, d.dau, m.mau, d.dau * 10000 // m.mau AS stickiness_bp
      |FROM dau d JOIN mau m ON m.day = d.day
      |ORDER BY d.day""".stripMargin

  // ---------------------------------------------------------- inter-arrival

  /** Per-user inter-event gap profile in exact microseconds: gap count,
    * min / max / mean / lower-median gap. Mean needs no window at all —
    * consecutive gaps telescope, so Σgaps = max(ts) − min(ts) and the
    * mean is one floor division of plain aggregates. Min/max/median run
    * over the per-user lag stream: both windows partition BY USER
    * (per-partition work = that user's event count — bounded, never a
    * fat key). Ordering ties on identical timestamps break by event_id,
    * making every surface deterministic. */
  def interarrival(events: DataFrame): DataFrame = {
    val ts = events.select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gaps = ts
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
    val wg = Window.partitionBy(col("user_id")).orderBy(col("gap_us"))
    val med = gaps
      .withColumn("rk", row_number().over(wg))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rk") === expr("(n + 1) div 2"))
      .select(col("user_id"), col("gap_us").as("median_gap_us"))
    val agg = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("span_us"))
      .withColumn("mean_gap_us", expr("span_us div n_gaps"))
    agg.join(med, Seq("user_id"))
      .select(col("user_id"), col("n_gaps"), col("min_gap_us"),
        col("max_gap_us"), col("mean_gap_us"), col("median_gap_us"))
      .orderBy(col("user_id"))
  }

  val interarrivalSql: String =
    """WITH ts AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      |  FROM events),
      |gaps AS (
      |  SELECT user_id,
      |    us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS gap_us
      |  FROM ts),
      |g AS (SELECT * FROM gaps WHERE gap_us IS NOT NULL),
      |med AS (
      |  SELECT user_id, gap_us AS median_gap_us FROM (
      |    SELECT user_id, gap_us,
      |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_us) AS rk,
      |      COUNT(*) OVER (PARTITION BY user_id) AS n
      |    FROM g) WHERE rk = (n + 1) // 2),
      |agg AS (
      |  SELECT user_id, COUNT(*) AS n_gaps, MIN(gap_us) AS min_gap_us,
      |    MAX(gap_us) AS max_gap_us, SUM(gap_us) // COUNT(*) AS mean_gap_us
      |  FROM g GROUP BY user_id)
      |SELECT a.user_id, a.n_gaps, a.min_gap_us, a.max_gap_us,
      |  CAST(a.mean_gap_us AS BIGINT) AS mean_gap_us, m.median_gap_us
      |FROM agg a JOIN med m ON m.user_id = a.user_id
      |ORDER BY a.user_id""".stripMargin

  // ----------------------------------------------------------------- CUPED

  /** CUPED variance reduction (Deng et al., WSDM'13 shape) over the
    * events stream: the experiment window is split at its midpoint
    * (mid_us = (min+max) div 2 in exact epoch-micros), each user's
    * pre-period spend X and post-period spend Y are exact cent sums,
    * variants assigned by user_id parity, and the adjusted post metric
    * is Y − θ·(X − μX) with θ = cov(X,Y)/var(X) POOLED across variants
    * (the standard choice — θ must not depend on assignment).
    *
    * Scale shape: one pass builds per-user (X, Y) — a partial-agg
    * groupBy with two conditional sums; moments are five more BIGINT
    * partial aggregates; the final row is arithmetic over broadcast
    * scalars. θ and the adjusted means are the only real-valued
    * surfaces: computed once in IEEE double from exact integers
    * (div/mul/sub only — all correctly rounded, cross-engine
    * bit-equal). Output: one row per variant with raw and adjusted
    * means in double plus all exact inputs. */
  def cuped(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"),
      unix_micros(col("ts")).as("us"),
      (Exact.money(col("value")) * 100).cast("long").as("cents"))
    val bounds = base.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(expr("(lo + hi) div 2").as("mid"))
    val perUser = base.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(sum(when(col("us") < col("mid"), col("cents")).otherwise(0L))
          .as("x"),
        sum(when(col("us") >= col("mid"), col("cents")).otherwise(0L))
          .as("y"))
      .withColumn("variant", expr("CAST(user_id % 2 AS INT)"))
    val pooled = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("double").as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("double").as("sxy"))
    val byVariant = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_v"),
        sum(col("x")).as("sx_v"), sum(col("y")).as("sy_v"))
    byVariant.crossJoin(broadcast(pooled))
      .withColumn("theta",
        (col("n").cast("double") * col("sxy") -
          col("sx").cast("double") * col("sy").cast("double")) /
        (col("n").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("mu_x", col("sx").cast("double") / col("n").cast("double"))
      .select(col("variant"), col("n_v"), col("sx_v"), col("sy_v"),
        col("theta"),
        (col("sy_v").cast("double") / col("n_v").cast("double"))
          .as("mean_y"),
        ((col("sy_v").cast("double") -
          col("theta") * (col("sx_v").cast("double") -
            col("n_v").cast("double") * col("mu_x"))) /
          col("n_v").cast("double")).as("adj_mean_y"))
      .orderBy(col("variant"))
  }

  val cupedSql: String =
    """WITH base AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM base),
      |pu AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN us < mid THEN cents ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN us >= mid THEN cents ELSE 0 END) AS BIGINT) AS y
      |  FROM base CROSS JOIN b GROUP BY user_id),
      |pv AS (SELECT *, CAST(user_id % 2 AS INT) AS variant FROM pu),
      |pooled AS (
      |  -- per-user cents fit BIGINT squared; DuckDB SUM promotes to
      |  -- HUGEINT, the VARCHAR hop gives the correctly rounded double
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM pv),
      |bv AS (
      |  SELECT variant, COUNT(*) AS n_v,
      |    CAST(SUM(x) AS BIGINT) AS sx_v, CAST(SUM(y) AS BIGINT) AS sy_v
      |  FROM pv GROUP BY variant)
      |SELECT variant, n_v, sx_v, sy_v,
      |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    AS theta,
      |  CAST(sy_v AS DOUBLE) / CAST(n_v AS DOUBLE) AS mean_y,
      |  (CAST(sy_v AS DOUBLE)
      |    - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |       / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |      * (CAST(sx_v AS DOUBLE)
      |         - CAST(n_v AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
      |    / CAST(n_v AS DOUBLE) AS adj_mean_y
      |FROM bv CROSS JOIN pooled
      |ORDER BY variant""".stripMargin

  // ------------------------------------------------------- volume anomaly

  /** Ingest-volume anomaly monitor: daily event counts against their
    * trailing-7-day window (excluding the current day), flagged when
    * the squared z-score exceeds 3² — entirely in integers via
    * z² = (n·c − s)² / (n·s2 − s²), so no mean/stddev doubles ever
    * exist. Exactly the check a 100 TB ingest DAG runs before trusting
    * a day's drop: the window is over the DAILY relation (≤ one row per
    * day — trivially small), all heavy lifting is one partial-agg
    * groupBy over the raw stream. Days with fewer than 7 predecessors
    * report z2_milli = NULL and never flag (warm-up). */
  def volumeAnomaly(events: DataFrame, zThresh: Int = 3): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    daily
      .withColumn("n_prev", count(col("cnt")).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
      .select(col("day"), col("cnt"), col("n_prev"),
        when(col("n_prev") === 7,
          expr("CASE WHEN n_prev * s2 - s * s = 0 THEN NULL ELSE " +
            "(n_prev * cnt - s) * (n_prev * cnt - s) * 1000L " +
            "div (n_prev * s2 - s * s) END")).as("z2_milli"))
      .withColumn("flag",
        coalesce(col("z2_milli") > lit(zThresh * zThresh * 1000L),
          lit(false)))
      .orderBy(col("day"))
  }

  def volumeAnomalySql(zThresh: Int = 3): String =
    s"""WITH daily AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT day, cnt,
      |    COUNT(cnt) OVER tw AS n_prev,
      |    -- CAST back from the windowed-SUM HUGEINT so z2_milli stays
      |    -- BIGINT (exact at any magnitude, not float64 past 2^53)
      |    CAST(SUM(cnt) OVER tw AS BIGINT) AS s,
      |    CAST(SUM(cnt * cnt) OVER tw AS BIGINT) AS s2
      |  FROM daily
      |  WINDOW tw AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT day, cnt, n_prev,
      |  CASE WHEN n_prev = 7 AND n_prev * s2 - s * s <> 0
      |       THEN (n_prev * cnt - s) * (n_prev * cnt - s) * 1000
      |            // (n_prev * s2 - s * s) END AS z2_milli,
      |  COALESCE(CASE WHEN n_prev = 7 AND n_prev * s2 - s * s <> 0
      |       THEN (n_prev * cnt - s) * (n_prev * cnt - s) * 1000
      |            // (n_prev * s2 - s * s) END > ${zThresh * zThresh * 1000},
      |    FALSE) AS flag
      |FROM w ORDER BY day""".stripMargin

  // -------------------------------------------------------- Neyman design

  /** Neyman-optimal stratified sampling allocation over customer
    * account balances by market segment: n_h ∝ N_h·σ_h for a total
    * budget B. All-integer: per-stratum variance in cents² is the
    * exact rational (n·Σx² − (Σx)²) / (n·(n−1)) floored to BIGINT
    * (DECIMAL(38,0) intermediates — products of 15k×1e16 overflow
    * BIGINT), σ as the INTEGER sqrt. floor(sqrt(v)) on a correctly
    * rounded IEEE sqrt is deterministic for v < 2^52 (a non-square v
    * would need |v − k²| < k²·2⁻⁵² < 1 to straddle an integer —
    * impossible for integers once k < 2²⁶); variances here are ≤
    * ~1e12 cents². Weights and allocations are then pure BIGINT
    * arithmetic: no cross-stratum double sum ever happens (double
    * totals over a handful of rows are NOT order-stable cross-engine —
    * the reason σ never leaves integer land). */
  def neymanAllocation(customer: DataFrame, budget: Long = 1000L): DataFrame = {
    val m = customer
      .select(col("c_mktsegment").as("seg"),
        (Exact.money(col("c_acctbal")) * 100).cast("long").as("cents"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("cents")).as("sx"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("sxx"))
      .withColumn("var_c2",
        expr("""CAST((CAST(n_h AS DECIMAL(38,0)) * sxx
                 - CAST(sx AS DECIMAL(38,0)) * sx)
                div (CAST(n_h AS DECIMAL(38,0)) * (n_h - 1)) AS BIGINT)"""))
      .withColumn("sd_cents",
        floor(sqrt(col("var_c2").cast("double"))).cast("long"))
      .withColumn("w", col("n_h") * col("sd_cents"))
    val tot = m.agg(sum(col("w")).as("w_tot"))
    m.crossJoin(broadcast(tot))
      .select(col("seg"), col("n_h"), col("sd_cents"), col("w"),
        expr(s"w * ${budget}L div w_tot").as("alloc"),
        expr("w * 10000L div w_tot").as("share_bp"))
      .orderBy(col("seg"))
  }

  def neymanAllocationSql(budget: Long = 1000L): String =
    s"""WITH c AS (
      |  SELECT c_mktsegment AS seg,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM customer),
      |-- DuckDB SUM(BIGINT) → HUGEINT, so n·Σx² (~2e20) never overflows;
      |-- the Spark twin runs the same values through DECIMAL(38,0)
      |m AS (
      |  SELECT seg, COUNT(*) AS n_h, SUM(cents) AS sx,
      |    SUM(cents * cents) AS sxx
      |  FROM c GROUP BY seg),
      |v AS (
      |  SELECT seg, n_h, sx,
      |    CAST((n_h * sxx - sx * sx) // (n_h * (n_h - 1)) AS BIGINT) AS var_c2
      |  FROM m),
      |s AS (
      |  SELECT seg, n_h, var_c2,
      |    CAST(FLOOR(SQRT(CAST(var_c2 AS DOUBLE))) AS BIGINT) AS sd_cents
      |  FROM v),
      |wgt AS (SELECT *, n_h * sd_cents AS w FROM s),
      |t AS (SELECT CAST(SUM(w) AS BIGINT) AS w_tot FROM wgt)
      |SELECT seg, n_h, sd_cents, CAST(w AS BIGINT) AS w,
      |  w * ${budget} // w_tot AS alloc,
      |  w * 10000 // w_tot AS share_bp
      |FROM wgt CROSS JOIN t
      |ORDER BY seg""".stripMargin

  // ----------------------------------------------------- activation

  /** Unordered activation checklist: what share of users has performed
    * EVERY core action at least once (order-free — the E9 funnel's
    * sibling for setup checklists where sequence doesn't matter), plus
    * per-step penetration. One distinct (user, type) relation feeds
    * both: penetration per type, and per-user distinct-step counts for
    * the all-steps rate. All exact floor bp. */
  def activation(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ut = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_type")).distinct()
    val users = events.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val per = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_step_users"))
    val complete = ut.groupBy(col("user_id"))
      .agg(count(lit(1)).as("k"))
      .filter(col("k") === steps.size)
      .agg(count(lit(1)).as("n_complete"))
    per.crossJoin(broadcast(users)).crossJoin(broadcast(complete))
      .select(col("event_type"), col("n_step_users"), col("n_users"),
        expr("n_step_users * 10000L div n_users").as("penetration_bp"),
        col("n_complete"),
        expr("n_complete * 10000L div n_users").as("activation_bp"))
      .orderBy(col("event_type"))
  }

  def activationSql(
      steps: Seq[String] = Seq("view", "click", "purchase")): String = {
    val inList = steps.map(s => s"'$s'").mkString(", ")
    s"""WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events
      |  WHERE event_type IN ($inList)),
      |u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
      |per AS (
      |  SELECT event_type, COUNT(*) AS n_step_users FROM ut GROUP BY 1),
      |cmp AS (
      |  SELECT COUNT(*) AS n_complete FROM (
      |    SELECT user_id FROM ut GROUP BY user_id
      |    HAVING COUNT(*) = ${steps.size}))
      |SELECT event_type, n_step_users, u.n_users,
      |  n_step_users * 10000 // u.n_users AS penetration_bp,
      |  cmp.n_complete,
      |  cmp.n_complete * 10000 // u.n_users AS activation_bp
      |FROM per CROSS JOIN u CROSS JOIN cmp
      |ORDER BY event_type""".stripMargin
  }

  // -------------------------------------------------- session coverage

  /** Engagement density: how much of a user's lifetime span is spent
    * INSIDE sessions (the 30-minute-gap rule shared with the W5 /
    * E27 sessionizers) — total in-session microseconds over first-to-
    * last-event span, exact floor bp. Single-event sessions contribute
    * zero duration (a point has no extent — the honest convention);
    * single-session users whose one session IS their span read 10000.
    * Two user-keyed windows (gap flag, session id by running sum) +
    * two partial-agg groupBys; per-partition work is bounded by a
    * user's event count. */
  def sessionCoverage(events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val marked = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("new_session",
        (coalesce(col("us") - lag(col("us"), 1).over(w), lit(Long.MaxValue))
          > gapUs).cast("long"))
      .withColumn("sid", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val sessions = marked.groupBy(col("user_id"), col("sid"))
      .agg((max(col("us")) - min(col("us"))).as("dur_us"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("dur_us")).as("in_session_us"))
      .join(
        marked.groupBy(col("user_id"))
          .agg((max(col("us")) - min(col("us"))).as("span_us")),
        Seq("user_id"))
      .select(col("user_id"), col("n_sessions"), col("in_session_us"),
        col("span_us"),
        expr("CASE WHEN span_us > 0 "
          + "THEN in_session_us * 10000L div span_us END").as("coverage_bp"))
      .orderBy(col("user_id"))
  }

  def sessionCoverageSql(gapUs: Long = 30L * 60 * 1000000): String =
    s"""WITH ts AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      |  FROM events),
      |m AS (
      |  SELECT user_id, us, event_id,
      |    CASE WHEN us - LAG(us) OVER w IS NULL
      |           OR us - LAG(us) OVER w > $gapUs
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM ts
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sid AS (
      |  SELECT user_id, us,
      |    SUM(new_session) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m),
      |sess AS (
      |  SELECT user_id, sid, MAX(us) - MIN(us) AS dur_us
      |  FROM sid GROUP BY user_id, sid),
      |per AS (
      |  SELECT user_id, COUNT(*) AS n_sessions,
      |    CAST(SUM(dur_us) AS BIGINT) AS in_session_us
      |  FROM sess GROUP BY user_id),
      |sp AS (
      |  SELECT user_id, MAX(us) - MIN(us) AS span_us FROM ts
      |  GROUP BY user_id)
      |SELECT p.user_id, p.n_sessions, p.in_session_us, sp.span_us,
      |  CASE WHEN sp.span_us > 0
      |       THEN p.in_session_us * 10000 // sp.span_us END AS coverage_bp
      |FROM per p JOIN sp ON sp.user_id = p.user_id
      |ORDER BY p.user_id""".stripMargin

  // -------------------------------------------------- next-type baseline

  /** Majority-class next-event baseline: per event type, the most
    * likely successor and the accuracy "always predict the argmax"
    * achieves — THE floor any sequence model must beat before its
    * training run is worth the tokens. One windowed pair count (the
    * E35 relation), argmax via struct max with lexical tie-break,
    * accuracy in floor bp; all over the vocabulary-bounded transition
    * matrix. */
  def nextTypeBaseline(events: DataFrame): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(wu).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    trans.groupBy(col("src"))
      // struct max = largest n, then lexicographically largest dst —
      // mirrored by ORDER BY n DESC, dst DESC in the oracle
      .agg(sum(col("n")).as("total"),
        max(struct(col("n"), col("dst"))).as("m"))
      .select(col("src"), col("total"), col("m.dst").as("predicted"),
        col("m.n").as("hits"),
        expr("m.n * 10000L div total").as("accuracy_bp"))
      .orderBy(col("src"))
  }

  val nextTypeBaselineSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |tr AS (
      |  SELECT prev_type AS src, event_type AS dst, COUNT(*) AS n
      |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |b AS (
      |  SELECT src, dst, n,
      |    ROW_NUMBER() OVER (PARTITION BY src
      |      ORDER BY n DESC, dst DESC) AS rk,
      |    CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS total
      |  FROM tr)
      |SELECT src, total, dst AS predicted, CAST(n AS BIGINT) AS hits,
      |  n * 10000 // total AS accuracy_bp
      |FROM b WHERE rk = 1 ORDER BY src""".stripMargin

  // ----------------------------------------------------------- bot flags

  /** Bot-cadence heuristic: users whose event stream is both inhumanly
    * fast (any sub-second inter-event gap) and inhumanly dense (events
    * per active day over a threshold) — the first-line abuse filter an
    * analytics pipeline runs before trusting engagement counts. Builds
    * on the E30 gap relation: per user n_events, active days, min gap,
    * exact milli events-per-day, and the two-condition verdict — all
    * integer, all partial-agg + one user-keyed lag window. */
  def botFlags(events: DataFrame, maxGapUs: Long = 1000000L,
      perDayMilliThresh: Long = 5000L): DataFrame = {
    val ts = events.select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      to_date(col("ts")).as("day"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gaps = ts.withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("day")).as("active_days"),
        min(col("gap_us")).as("min_gap_us"))
      .withColumn("per_day_milli",
        expr("n_events * 1000L div active_days"))
      .withColumn("bot",
        coalesce(col("min_gap_us") < maxGapUs, lit(false)) &&
          col("per_day_milli") > perDayMilliThresh)
      .select(col("user_id"), col("n_events"), col("active_days"),
        col("min_gap_us"), col("per_day_milli"), col("bot"))
      .orderBy(col("user_id"))
  }

  def botFlagsSql(maxGapUs: Long = 1000000L,
      perDayMilliThresh: Long = 5000L): String =
    s"""WITH ts AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |g AS (
      |  SELECT user_id, day,
      |    us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS gap_us
      |  FROM ts),
      |agg AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    COUNT(DISTINCT day) AS active_days,
      |    MIN(gap_us) AS min_gap_us
      |  FROM g GROUP BY user_id)
      |SELECT user_id, n_events, active_days, min_gap_us,
      |  n_events * 1000 // active_days AS per_day_milli,
      |  COALESCE(min_gap_us < $maxGapUs, FALSE)
      |    AND n_events * 1000 // active_days > $perDayMilliThresh AS bot
      |FROM agg ORDER BY user_id""".stripMargin

  // ----------------------------------------------------- power analysis

  /** Post-hoc power check for the E18 experiment: was the sample big
    * enough to detect the difference it observed? Required n per arm =
    * 2·p̄(1−p̄)·(z_{α/2}+z_β)²/δ² with α=.05, power=.80 — (1.96+0.84)²
    * = 7.84 held as the exact rational 784/100, p̄ and δ as exact count
    * rationals, the whole ceiling one DECIMAL(38,0) ≡ HUGEINT division:
    * required = ⌈(2·784·C·(N−C)·(n0·n1)²) / (100·N²·(c1·n0−c0·n1)²)⌉.
    * δ = 0 (identical arms) → NULL required, powered NULL — the honest
    * "observed nothing, can't power a zero effect" answer. One event
    * pass (the abTest cells) + scalar arithmetic. */
  def powerCheck(events: DataFrame, minValue: Double = 200.0): DataFrame = {
    val per = events
      .groupBy(expr("CAST(user_id % 2 AS INT)").as("variant"))
      .agg(countDistinct(col("user_id")).as("n"),
        countDistinct(when(col("event_type") === "purchase"
          && col("value") >= minValue, col("user_id"))).as("c"))
    per.agg(
        coalesce(max(when(col("variant") === 0, col("n"))), lit(0L)).as("n0"),
        coalesce(max(when(col("variant") === 0, col("c"))), lit(0L)).as("c0"),
        coalesce(max(when(col("variant") === 1, col("n"))), lit(0L)).as("n1"),
        coalesce(max(when(col("variant") === 1, col("c"))), lit(0L)).as("c1"))
      .withColumn("bigN", col("n0") + col("n1"))
      .withColumn("bigC", col("c0") + col("c1"))
      .withColumn("dnum", expr("abs(c1 * n0 - c0 * n1)"))
      .withColumn("required_per_arm", expr(
        """CASE WHEN dnum > 0 THEN CAST(
          |  (CAST(2 * 784 AS DECIMAL(38,0)) * bigC * (bigN - bigC)
          |     * (CAST(n0 AS DECIMAL(38,0)) * n1)
          |     * (CAST(n0 AS DECIMAL(38,0)) * n1)
          |   + CAST(100 AS DECIMAL(38,0)) * bigN * bigN * dnum * dnum - 1)
          |  div (CAST(100 AS DECIMAL(38,0)) * bigN * bigN * dnum * dnum)
          |  AS BIGINT) END""".stripMargin))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        expr("bigC * 1000L div bigN").as("pbar_milli"),
        expr("CASE WHEN n0 > 0 AND n1 > 0 "
          + "THEN dnum * 1000000L div (n0 * n1) END").as("delta_micro"),
        col("required_per_arm"),
        expr("CASE WHEN required_per_arm IS NOT NULL "
          + "THEN n0 >= required_per_arm AND n1 >= required_per_arm END")
          .as("powered"))
  }

  def powerCheckSql(minValue: Double = 200.0): String =
    s"""WITH per AS (
      |  SELECT CAST(user_id % 2 AS INT) AS variant,
      |    COUNT(DISTINCT user_id) AS n,
      |    COUNT(DISTINCT CASE WHEN event_type = 'purchase'
      |                         AND value >= $minValue
      |                        THEN user_id END) AS c
      |  FROM events GROUP BY 1),
      |ab AS (
      |  SELECT
      |    COALESCE(MAX(CASE WHEN variant = 0 THEN n END), 0) AS n0,
      |    COALESCE(MAX(CASE WHEN variant = 0 THEN c END), 0) AS c0,
      |    COALESCE(MAX(CASE WHEN variant = 1 THEN n END), 0) AS n1,
      |    COALESCE(MAX(CASE WHEN variant = 1 THEN c END), 0) AS c1
      |  FROM per),
      |k AS (
      |  SELECT *, n0 + n1 AS bigN, c0 + c1 AS bigC,
      |    abs(c1 * n0 - c0 * n1) AS dnum
      |  FROM ab),
      |-- HUGEINT promotion carries the ~1e31 numerator exactly (the
      |-- Spark twin runs the same values through DECIMAL(38,0))
      |r AS (
      |  SELECT *, CASE WHEN dnum > 0 THEN CAST(
      |    (2 * 784 * bigC * (bigN - bigC)
      |       * (CAST(n0 AS HUGEINT) * n1) * (CAST(n0 AS HUGEINT) * n1)
      |     + 100 * CAST(bigN AS HUGEINT) * bigN * dnum * dnum - 1)
      |    // (100 * CAST(bigN AS HUGEINT) * bigN * dnum * dnum)
      |    AS BIGINT) END AS required_per_arm
      |  FROM k)
      |SELECT n0, c0, n1, c1,
      |  bigC * 1000 // bigN AS pbar_milli,
      |  CASE WHEN n0 > 0 AND n1 > 0
      |       THEN dnum * 1000000 // (n0 * n1) END AS delta_micro,
      |  required_per_arm,
      |  CASE WHEN required_per_arm IS NOT NULL
      |       THEN n0 >= required_per_arm AND n1 >= required_per_arm END
      |    AS powered
      |FROM r""".stripMargin

  // ------------------------------------------- difference-in-differences

  /** Difference-in-differences readout — E31's (CUPED) sibling when the
    * "treatment" switches on at a known time for one group: the 2×2
    * (variant × pre/post) spend table and the DiD estimate
    * (Δtreated − Δcontrol), all exact. Period splits at the E31 epoch-
    * micros midpoint, variant by user parity; per-variant user counts
    * are the denominators (a user's absence in a period is a 0, not a
    * dropout). The estimate is surfaced as exact milli-cents via one
    * cross-multiplied integer division: ((s11−s10)·u0 − (s01−s00)·u1)
    * ·1000 div (u1·u0) — no IEEE means anywhere. One event pass + a
    * 4-cell pivot. */
  def diffInDiff(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"),
      unix_micros(col("ts")).as("us"),
      (Exact.money(col("value")) * 100).cast("long").as("cents"))
    val bounds = base.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(expr("(lo + hi) div 2").as("mid"))
    val cells = base.crossJoin(broadcast(bounds))
      .withColumn("variant", expr("CAST(user_id % 2 AS INT)"))
      .withColumn("post", (col("us") >= col("mid")).cast("int"))
      .groupBy(col("variant"))
      .agg(countDistinct(col("user_id")).as("u"),
        sum(when(col("post") === 0, col("cents")).otherwise(0L)).as("s_pre"),
        sum(when(col("post") === 1, col("cents")).otherwise(0L)).as("s_post"))
    cells.agg(
        max(when(col("variant") === 0, col("u"))).as("u0"),
        max(when(col("variant") === 0, col("s_pre"))).as("s00"),
        max(when(col("variant") === 0, col("s_post"))).as("s01"),
        max(when(col("variant") === 1, col("u"))).as("u1"),
        max(when(col("variant") === 1, col("s_pre"))).as("s10"),
        max(when(col("variant") === 1, col("s_post"))).as("s11"))
      .select(col("u0"), col("s00"), col("s01"),
        col("u1"), col("s10"), col("s11"),
        expr("((s11 - s10) * u0 - (s01 - s00) * u1) * 1000L div (u1 * u0)")
          .as("did_millicents"))
  }

  val diffInDiffSql: String =
    """WITH base AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM base),
      |cells AS (
      |  SELECT CAST(user_id % 2 AS INT) AS variant,
      |    COUNT(DISTINCT user_id) AS u,
      |    CAST(SUM(CASE WHEN us < mid THEN cents ELSE 0 END) AS BIGINT)
      |      AS s_pre,
      |    CAST(SUM(CASE WHEN us >= mid THEN cents ELSE 0 END) AS BIGINT)
      |      AS s_post
      |  FROM base CROSS JOIN b GROUP BY 1),
      |p AS (
      |  SELECT
      |    MAX(CASE WHEN variant = 0 THEN u END) AS u0,
      |    MAX(CASE WHEN variant = 0 THEN s_pre END) AS s00,
      |    MAX(CASE WHEN variant = 0 THEN s_post END) AS s01,
      |    MAX(CASE WHEN variant = 1 THEN u END) AS u1,
      |    MAX(CASE WHEN variant = 1 THEN s_pre END) AS s10,
      |    MAX(CASE WHEN variant = 1 THEN s_post END) AS s11
      |  FROM cells)
      |SELECT u0, s00, s01, u1, s10, s11,
      |  ((s11 - s10) * u0 - (s01 - s00) * u1) * 1000 // (u1 * u0)
      |    AS did_millicents
      |FROM p""".stripMargin

  // --------------------------------------------- Markov steady state

  /** Stationary distribution of the event-type transition chain by
    * integer power iteration — "where does a user's attention settle":
    * π' = πP with P the row-normalized per-user consecutive-pair
    * counts, mass in Scale = 10¹² units, each step's per-edge transfer
    * one exact floor division π_i·c_ij div out_i (the PageRank
    * fixed-point discipline — float iteration could never sit behind a
    * cross-engine hash). Dangling states (no outgoing pair) hold their
    * mass. The state space is the event-type vocabulary (tiny at any
    * data scale — the heavy lifting is the ONE windowed pass building
    * pair counts); floor remainders bias total mass down a few units
    * per round, deterministically in both engines. */
  def markovSteadyState(events: DataFrame, iters: Int = 12): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val wu = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(wu).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    // the transition matrix over event TYPES is vocabulary-bounded
    // metadata (≤ |types|² cells at ANY data scale — the centroid /
    // per-partition-count exception, not a result-set collect); the one
    // heavy pass is the windowed pair count above, which stays
    // distributed. Guarded so a mis-use on an unbounded key fails loud.
    val cells = trans.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cells.length <= 100000,
      s"markovSteadyState: ${cells.length} transition cells — the state " +
        "space must be vocabulary-bounded")
    val states = events.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    val out = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pi: Map[String, Long] =
      states.map(_ -> graft.rel.Graph.Scale / states.length).toMap
    for (_ <- 1 to iters) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      pi.foreach { case (s, m) =>
        out.get(s) match {
          case None => next(s) += m // dangling state holds its mass
          case Some(o) =>
            cells.filter(_._1 == s).foreach { case (_, d, n) =>
              // m·n can wrap Long once a cell count n exceeds ~9.2e6
              // (mass m is up to Scale = 10¹²) — the 100k-cell guard
              // bounds cardinality, not magnitudes. Widen the product;
              // the quotient is ≤ m, so the Long result is safe.
              next(d) += (BigInt(m) * n / o).toLong
            }
        }
      }
      pi = states.map(s => s -> next(s)).toMap
    }
    pi.toSeq.map { case (s, m) => (s, m) }
      .toDF("state", "m")
      .orderBy(col("state"))
  }

  def markovSteadyStateSql(iters: Int = 12): String = {
    // MATERIALIZED: each step references its predecessor three times —
    // left inlined, the chain re-expands exponentially (2^iters scans
    // of the base relation blew DuckDB's file-handle budget)
    val steps = (1 to iters).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT state, CAST(SUM(mm) AS BIGINT) AS m FROM (
         |    -- widen the m·n product (HUGEINT ≙ the Scala BigInt hop):
         |    -- BIGINT·BIGINT raises on overflow once n is large
         |    SELECT te.dst AS state,
         |      CAST(CAST(p${i - 1}.m AS HUGEINT) * te.n // te.out AS BIGINT)
         |        AS mm
         |    FROM p${i - 1} JOIN te ON te.src = p${i - 1}.state
         |    UNION ALL
         |    SELECT p${i - 1}.state, p${i - 1}.m
         |    FROM p${i - 1}
         |    WHERE p${i - 1}.state NOT IN (SELECT src FROM te))
         |  GROUP BY state)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS (
       |  SELECT user_id, event_type,
       |    LAG(event_type) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
       |  FROM events),
       |tr AS (
       |  SELECT prev_type AS src, event_type AS dst, COUNT(*) AS n
       |  FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |o AS (SELECT src, CAST(SUM(n) AS BIGINT) AS out FROM tr GROUP BY src),
       |te AS MATERIALIZED (SELECT tr.src, tr.dst, tr.n, o.out
       |       FROM tr JOIN o ON o.src = tr.src),
       |st AS (SELECT DISTINCT event_type AS state FROM events),
       |kk AS (SELECT COUNT(*) AS k FROM st),
       |p0 AS MATERIALIZED (SELECT state, ${graft.rel.Graph.Scale} // k AS m
       |       FROM st CROSS JOIN kk),
       |$steps
       |SELECT st.state, CAST(COALESCE(p.m, 0) AS BIGINT) AS m
       |FROM st LEFT JOIN p$iters p ON p.state = st.state
       |ORDER BY st.state""".stripMargin
  }

  // ------------------------------------------------- Wilson-ranked CTR

  /** Conversion rates ranked by their Wilson lower bound (z = 2) — the
    * "sort by lower bound, not by average" rule that keeps a 1/1
    * bucket from outranking a 96/100 one. Buckets are user_id % 10
    * (deterministic campaign arms), success = E18's high-value-purchase
    * conversion. The bound is integerized once and for all:
    * wilson_milli = (1000·(c+2) − 2·isqrt(10⁶·(c·(n−c)+n) div n))
    * div (n+4) — exactly the z=2 Wilson formula with the sqrt floored
    * (the L5q deterministic-isqrt argument; the floor is part of the
    * declared semantics, biasing the bound conservatively by < 1 milli).
    * Two partial-agg passes over events; 10-row artifact. */
  def wilsonCtr(events: DataFrame, minValue: Double = 200.0): DataFrame = {
    val per = events
      .groupBy(expr("CAST(user_id % 10 AS INT)").as("bucket"))
      .agg(countDistinct(col("user_id")).as("n"),
        countDistinct(when(col("event_type") === "purchase"
          && col("value") >= minValue, col("user_id"))).as("c"))
    per
      .withColumn("ctr_milli", expr("c * 1000L div n"))
      .withColumn("wilson_milli",
        expr("""(1000L * (c + 2) - 2L * CAST(FLOOR(SQRT(CAST(
             |  (c * (n - c) + n) * 1000000L div n AS DOUBLE))) AS BIGINT))
             |  div (n + 4)""".stripMargin))
      .select(col("bucket"), col("n"), col("c"),
        col("ctr_milli"), col("wilson_milli"))
      .orderBy(col("wilson_milli").desc, col("bucket"))
  }

  def wilsonCtrSql(minValue: Double = 200.0): String =
    s"""WITH per AS (
      |  SELECT CAST(user_id % 10 AS INT) AS bucket,
      |    COUNT(DISTINCT user_id) AS n,
      |    COUNT(DISTINCT CASE WHEN event_type = 'purchase'
      |                         AND value >= $minValue
      |                        THEN user_id END) AS c
      |  FROM events GROUP BY 1)
      |SELECT bucket, n, c,
      |  c * 1000 // n AS ctr_milli,
      |  (1000 * (c + 2) - 2 * CAST(FLOOR(SQRT(CAST(
      |    (c * (n - c) + n) * 1000000 // n AS DOUBLE))) AS BIGINT))
      |    // (n + 4) AS wilson_milli
      |FROM per
      |ORDER BY wilson_milli DESC, bucket""".stripMargin

  // --------------------------------------------------- cumulative users

  /** Users-to-date growth curve: per active day, DAU, first-time users
    * and the cumulative distinct user count — WITHOUT any running
    * distinct: a user's first day is one partial-agg groupBy, new-user
    * counts aggregate per day, and the running sum over the daily
    * relation IS the cumulative distinct (each user counted exactly
    * once, on their first day). The growth-chart query every dashboard
    * runs, in the shape that survives 100 TB (the naive
    * count(distinct) over an expanding window re-scans history per
    * day). */
  def cumulativeUsers(events: DataFrame): DataFrame = {
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val firsts = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    dau.join(firsts, Seq("day"), "left")
      .select(col("day"), col("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("day"))
  }

  val cumulativeUsersSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
      |f AS (
      |  SELECT day, COUNT(*) AS new_users FROM (
      |    SELECT user_id, MIN(day) AS day FROM ud GROUP BY user_id)
      |  GROUP BY day)
      |SELECT d.day, d.dau,
      |  CAST(COALESCE(f.new_users, 0) AS BIGINT) AS new_users,
      |  CAST(SUM(COALESCE(f.new_users, 0)) OVER (ORDER BY d.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_users
      |FROM dau d LEFT JOIN f ON f.day = d.day
      |ORDER BY d.day""".stripMargin

  // -------------------------------------------------------- activity grid

  /** Hour-of-week activity heatmap: the (weekday, hour) count grid with
    * exact basis-point shares — the load profile behind capacity
    * planning and the seasonal baselines (E28 keys on hour-of-day; this
    * is its two-axis readout). Weekday is computed from the epoch-day
    * INTEGER ((d + 3) mod 7 → Monday = 0; 1970-01-01 was a Thursday),
    * sidestepping both engines' dayofweek convention drift entirely.
    * One partial-agg groupBy over raw events; the grid is ≤ 168 rows. */
  def hourOfWeekHeatmap(events: DataFrame): DataFrame = {
    val cells = events
      .select(
        expr("(datediff(to_date(ts), DATE '1970-01-01') + 3) % 7")
          .cast("long").as("weekday"),
        hour(col("ts")).cast("long").as("hr"))
      .groupBy(col("weekday"), col("hr"))
      .agg(count(lit(1)).as("cnt"))
    val tot = cells.agg(sum(col("cnt")).as("total"))
    cells.crossJoin(broadcast(tot))
      .select(col("weekday"), col("hr"), col("cnt"),
        expr("cnt * 10000L div total").as("share_bp"))
      .orderBy(col("weekday"), col("hr"))
  }

  val hourOfWeekHeatmapSql: String =
    """WITH cells AS (
      |  SELECT
      |    CAST((date_diff('day', DATE '1970-01-01',
      |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) + 3) % 7 AS BIGINT)
      |      AS weekday,
      |    CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM cells)
      |SELECT weekday, hr, cnt, cnt * 10000 // total AS share_bp
      |FROM cells CROSS JOIN t
      |ORDER BY weekday, hr""".stripMargin

  def queries: Seq[(String, QueryDef)] = Seq(
    "events_activation" -> QueryDef(
      (s: SparkSession, d: String) => activation(Tables.events(s, d)),
      activationSql()),
    "events_session_coverage" -> QueryDef(
      (s: SparkSession, d: String) => sessionCoverage(Tables.events(s, d)),
      sessionCoverageSql()),
    "events_next_type_baseline" -> QueryDef(
      (s: SparkSession, d: String) => nextTypeBaseline(Tables.events(s, d)),
      nextTypeBaselineSql),
    "events_bot_flags" -> QueryDef(
      (s: SparkSession, d: String) => botFlags(Tables.events(s, d)),
      botFlagsSql()),
    "events_power_check" -> QueryDef(
      (s: SparkSession, d: String) => powerCheck(Tables.events(s, d)),
      powerCheckSql()),
    "events_did" -> QueryDef(
      (s: SparkSession, d: String) => diffInDiff(Tables.events(s, d)),
      diffInDiffSql),
    "events_markov_steady" -> QueryDef(
      (s: SparkSession, d: String) => markovSteadyState(Tables.events(s, d)),
      markovSteadyStateSql()),
    "events_ctr_wilson" -> QueryDef(
      (s: SparkSession, d: String) => wilsonCtr(Tables.events(s, d)),
      wilsonCtrSql()),
    "events_cumulative_users" -> QueryDef(
      (s: SparkSession, d: String) => cumulativeUsers(Tables.events(s, d)),
      cumulativeUsersSql),
    "events_heatmap" -> QueryDef(
      (s: SparkSession, d: String) => hourOfWeekHeatmap(Tables.events(s, d)),
      hourOfWeekHeatmapSql),
    "events_stickiness" -> QueryDef(
      (s: SparkSession, d: String) => stickiness(Tables.events(s, d)),
      stickinessSql()),
    "events_interarrival" -> QueryDef(
      (s: SparkSession, d: String) => interarrival(Tables.events(s, d)),
      interarrivalSql),
    "events_cuped" -> QueryDef(
      (s: SparkSession, d: String) => cuped(Tables.events(s, d)),
      cupedSql),
    "dq_volume_anomaly" -> QueryDef(
      (s: SparkSession, d: String) => volumeAnomaly(Tables.events(s, d)),
      volumeAnomalySql()),
    "sample_neyman" -> QueryDef(
      (s: SparkSession, d: String) => neymanAllocation(Tables.customer(s, d)),
      neymanAllocationSql()))
}
