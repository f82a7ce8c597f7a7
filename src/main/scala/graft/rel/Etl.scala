package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Exact, QueryDef, Tables}

/** Warehouse-maintenance operators: SCD2 dimension-history merge and
  * incremental aggregate maintenance. The reference is an ETL tool
  * (ingest → conform → summarize); these are the two ETL primitives it
  * would need the day its users ask for history ("what did this
  * customer look like in March?") and for daily refresh without a full
  * rescan. Both are single-shuffle compositions.
  *
  * Scale shape:
  *   - scd2Merge is ONE equi-join (base ⋈ updates on the key) followed
  *     by a narrow explode — never two passes over the join output, no
  *     window. At 100 TB the dimension shuffles once; AQE broadcasts
  *     the update batch when (as usual) it is small.
  *   - incrementalAgg unions per-partition partial aggregates and
  *     re-combines — the map-side-combine shape Spark's planner also
  *     uses internally; exactness under reordering is guaranteed by
  *     DECIMAL money arithmetic (core/Exact), which is the property
  *     that makes incremental maintenance VALID at all (double sums
  *     would drift from the full recompute).
  */
object Etl {

  /** Slowly-changing-dimension type 2 merge. `base` is the current
    * dimension (one row per key, open-ended validity starting
    * `baseFrom`); `updates` carries new attribute values effective at
    * `effective`. Rows whose attributes actually changed are closed
    * (valid_to = effective) and re-opened with the new values; no-op
    * updates and untouched keys pass through; brand-new keys insert as
    * current. Output: key, attrs, valid_from, valid_to, is_current. */
  def scd2Merge(base: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], baseFrom: String, effective: String): DataFrame = {
    val upd = updates.select(
      col(key).as("u_key") +: attrs.map(a => col(a).as(s"u_$a")): _*)
    val changed = attrs
      .map(a => !(col(a) <=> col(s"u_$a"))) // null-safe attr compare
      .reduce(_ || _)
    val from  = to_date(lit(baseFrom))
    val eff   = to_date(lit(effective))
    val nilTo = lit(null).cast("date")
    // all branch structs must carry IDENTICAL field names/types or the
    // CASE arms won't unify — alias attr columns back to their names
    def version(cols: Seq[Column], vFrom: Column, vTo: Column,
        current: Column) =
      struct(cols ++ Seq(vFrom.as("valid_from"), vTo.as("valid_to"),
        current.as("is_current")): _*)
    val baseAttrs = attrs.map(a => col(a).as(a))
    val updAttrs  = attrs.map(a => col(s"u_$a").as(a))
    val versions =
      when(col("u_key").isNull, // key not in the update batch
        array(version(baseAttrs, from, nilTo, lit(true))))
      .when(col(key).isNull,    // brand-new key
        array(version(updAttrs, eff, nilTo, lit(true))))
      .when(changed,            // real change: close + re-open
        array(version(baseAttrs, from, eff, lit(false)),
          version(updAttrs, eff, nilTo, lit(true))))
      .otherwise(               // no-op update
        array(version(baseAttrs, from, nilTo, lit(true))))
    base
      .join(upd, col(key) === col("u_key"), "full_outer")
      .select(coalesce(col(key), col("u_key")).as(key),
        explode(versions).as("v"))
      .select(col(key) +: (attrs ++ Seq("valid_from", "valid_to",
        "is_current")).map(a => col(s"v.$a").as(a)): _*)
      .orderBy(col(key), col("valid_from"))
  }

  /** The declared SCD2 surface: the customer dimension with a
    * deterministic synthetic update batch derived from it —
    * custkey % 7 == 0 gets a real balance change, % 7 == 1 a no-op
    * update, and three negative keys insert as new — so every merge
    * arm fires and the whole history is oracle-checkable. */
  def scd2Customer(base: DataFrame): DataFrame = {
    val changedArm = base.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        concat(lit("UPD "), col("c_name")).as("c_name"),
        (col("c_acctbal") + 100.0).as("c_acctbal"),
        col("c_mktsegment"))
    val noop = base.filter(col("c_custkey") % 7 === 1)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
    val fresh = base.sparkSession.range(1, 4)
      .select((-col("id")).as("c_custkey"),
        concat(lit("NEW CUSTOMER "), col("id")).as("c_name"),
        lit(0.0).as("c_acctbal"), lit("BUILDING").as("c_mktsegment"))
    scd2Merge(base, changedArm.unionByName(noop).unionByName(fresh),
      "c_custkey", Seq("c_name", "c_acctbal", "c_mktsegment"),
      baseFrom = "2024-01-01", effective = "2024-06-01")
  }

  val scd2CustomerSql: String =
    """WITH upd AS (
      |  SELECT c_custkey AS u_key, 'UPD ' || c_name AS u_name,
      |         c_acctbal + 100.0 AS u_acctbal, c_mktsegment AS u_seg
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 1
      |  UNION ALL
      |  SELECT -i, 'NEW CUSTOMER ' || CAST(i AS VARCHAR), 0.0, 'BUILDING'
      |  FROM (SELECT unnest(range(1, 4)) AS i)),
      |j AS (
      |  SELECT * FROM customer c FULL OUTER JOIN upd u ON c.c_custkey = u.u_key),
      |hist AS (
      |  -- untouched keys and no-op updates: one open row
      |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
      |         DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |         TRUE AS is_current
      |  FROM j WHERE c_custkey IS NOT NULL AND
      |    (u_key IS NULL OR (c_name IS NOT DISTINCT FROM u_name AND
      |      c_acctbal IS NOT DISTINCT FROM u_acctbal AND
      |      c_mktsegment IS NOT DISTINCT FROM u_seg))
      |  UNION ALL
      |  -- changed: closed old version
      |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
      |         DATE '2024-01-01', DATE '2024-06-01', FALSE
      |  FROM j WHERE c_custkey IS NOT NULL AND u_key IS NOT NULL AND
      |    NOT (c_name IS NOT DISTINCT FROM u_name AND
      |      c_acctbal IS NOT DISTINCT FROM u_acctbal AND
      |      c_mktsegment IS NOT DISTINCT FROM u_seg)
      |  UNION ALL
      |  -- changed: new open version
      |  SELECT c_custkey, u_name, u_acctbal, u_seg,
      |         DATE '2024-06-01', NULL, TRUE
      |  FROM j WHERE c_custkey IS NOT NULL AND u_key IS NOT NULL AND
      |    NOT (c_name IS NOT DISTINCT FROM u_name AND
      |      c_acctbal IS NOT DISTINCT FROM u_acctbal AND
      |      c_mktsegment IS NOT DISTINCT FROM u_seg)
      |  UNION ALL
      |  -- brand-new keys
      |  SELECT u_key, u_name, u_acctbal, u_seg, DATE '2024-06-01', NULL, TRUE
      |  FROM j WHERE c_custkey IS NULL)
      |SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
      |       valid_from, valid_to, is_current
      |FROM hist ORDER BY c_custkey, valid_from""".stripMargin

  /** Incremental aggregate maintenance: per-customer order stats kept
    * as combinable partials (count + exact DECIMAL sum). The "standing"
    * aggregate covers orders before the cutoff; the "delta" batch is
    * everything after; merging partials must equal the full recompute —
    * which is exactly what the oracle does (one straight GROUP BY over
    * all orders). */
  def incrementalOrderStats(orders: DataFrame, cutoff: String): DataFrame = {
    def partial(df: DataFrame) = df
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Exact.money(col("o_totalprice"))).as("spend"))
    val c = to_timestamp(lit(cutoff))
    val base  = partial(orders.filter(col("o_orderdate") < c))
    val delta = partial(orders.filter(col("o_orderdate") >= c))
    base.unionByName(delta)
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("spend")).cast("double").as("total_spend"))
      .orderBy(col("o_custkey"))
  }

  val incrementalOrderStatsSql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_spend
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Latest-wins upsert (the MERGE INTO … WHEN MATCHED THEN UPDATE /
    * WHEN NOT MATCHED THEN INSERT snapshot semantics, without history):
    * one unionByName + one per-key window pick — a single shuffle on
    * the key, no join, so the merge cost is O(base + updates) at any
    * scale. Precedence is explicit (updates rank above base; ties
    * impossible by construction), never row order. */
  def upsertLatest(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = base.withColumn("__prec", lit(0))
      .unionByName(updates.withColumn("__prec", lit(1)))
    tagged
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col("__prec").desc)))
      .filter(col("__rn") === 1)
      .drop("__prec", "__rn")
  }

  /** Declared surface: the scd2Customer update batch applied as a plain
    * snapshot upsert — changed rows replaced, no-ops idempotent, new
    * keys inserted, untouched keys carried. */
  def upsertCustomer(base: DataFrame): DataFrame = {
    val b = base.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
      col("c_mktsegment"))
    val changedArm = base.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        concat(lit("UPD "), col("c_name")).as("c_name"),
        (col("c_acctbal") + 100.0).as("c_acctbal"),
        col("c_mktsegment"))
    val noop = base.filter(col("c_custkey") % 7 === 1)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
    val fresh = base.sparkSession.range(1, 4)
      .select((-col("id")).as("c_custkey"),
        concat(lit("NEW CUSTOMER "), col("id")).as("c_name"),
        lit(0.0).as("c_acctbal"), lit("BUILDING").as("c_mktsegment"))
    upsertLatest(b, changedArm.unionByName(noop).unionByName(fresh), "c_custkey")
      .orderBy(col("c_custkey"))
  }

  val upsertCustomerSql: String =
    """WITH upd AS (
      |  SELECT c_custkey, 'UPD ' || c_name AS c_name,
      |         c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 1
      |  UNION ALL
      |  SELECT -i, 'NEW CUSTOMER ' || CAST(i AS VARCHAR), 0.0, 'BUILDING'
      |  FROM (SELECT unnest(range(1, 4)) AS i))
      |SELECT COALESCE(u.c_custkey, c.c_custkey) AS c_custkey,
      |       COALESCE(u.c_name, c.c_name) AS c_name,
      |       COALESCE(u.c_acctbal, c.c_acctbal) AS c_acctbal,
      |       COALESCE(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
      |FROM customer c FULL OUTER JOIN upd u USING (c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Snapshot diff: classify every key of two table versions as added /
    * removed / changed / unchanged — the audit a pipeline runs between
    * a table's daily versions before publishing. ONE full-outer join on
    * the key, null-safe attr compare, no second pass; the report is the
    * per-status count plus a deterministic sample of changed keys. */
  def tableDiff(before: DataFrame, after: DataFrame, key: String,
      attrs: Seq[String]): DataFrame = {
    val b = before.select(col(key).as("b_key") +:
      attrs.map(a => col(a).as(s"b_$a")): _*)
    val a = after.select(col(key).as("a_key") +:
      attrs.map(a => col(a).as(s"a_$a")): _*)
    val same = attrs.map(c => col(s"b_$c") <=> col(s"a_$c")).reduce(_ && _)
    b.join(a, col("b_key") === col("a_key"), "full_outer")
      .select(
        when(col("b_key").isNull, "added")
          .when(col("a_key").isNull, "removed")
          .when(same, "unchanged").otherwise("changed").as("status"),
        coalesce(col("b_key"), col("a_key")).as("k"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("first_key"))
      .orderBy(col("status"))
  }

  /** Declared surface: diff customer against its upsert result — every
    * status arm fires by construction (3 added, 1/7 changed via the
    * balance update, 1/7 + 5/7 unchanged, 0 removed → removed absent,
    * which the oracle must agree on too). */
  def diffCustomer(base: DataFrame): DataFrame =
    tableDiff(
      base.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment")),
      upsertCustomer(base),
      "c_custkey", Seq("c_name", "c_acctbal", "c_mktsegment"))

  val diffCustomerSql: String =
    """WITH upd AS (
      |  SELECT c_custkey, 'UPD ' || c_name AS c_name,
      |         c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 1
      |  UNION ALL
      |  SELECT -i, 'NEW CUSTOMER ' || CAST(i AS VARCHAR), 0.0, 'BUILDING'
      |  FROM (SELECT unnest(range(1, 4)) AS i)),
      |after AS (
      |  SELECT COALESCE(u.c_custkey, c.c_custkey) AS c_custkey,
      |         COALESCE(u.c_name, c.c_name) AS c_name,
      |         COALESCE(u.c_acctbal, c.c_acctbal) AS c_acctbal,
      |         COALESCE(u.c_mktsegment, c.c_mktsegment) AS c_mktsegment
      |  FROM customer c FULL OUTER JOIN upd u USING (c_custkey)),
      |j AS (
      |  SELECT b.c_custkey AS b_key, a.c_custkey AS a_key,
      |    CASE WHEN b.c_custkey IS NULL THEN 'added'
      |         WHEN a.c_custkey IS NULL THEN 'removed'
      |         WHEN b.c_name IS NOT DISTINCT FROM a.c_name
      |          AND b.c_acctbal IS NOT DISTINCT FROM a.c_acctbal
      |          AND b.c_mktsegment IS NOT DISTINCT FROM a.c_mktsegment
      |         THEN 'unchanged' ELSE 'changed' END AS status
      |  FROM customer b FULL OUTER JOIN after a ON b.c_custkey = a.c_custkey)
      |SELECT status, COUNT(*) AS n,
      |       MIN(COALESCE(b_key, a_key)) AS first_key
      |FROM j GROUP BY status ORDER BY status""".stripMargin

  /** CDC changelog apply — `upsertLatest` plus the piece MERGE
    * semantics need that it lacks: DELETE tombstones. The events log
    * stands in for a CDC feed keyed by user (signup = insert,
    * view/click/purchase = update, error = tombstone); the final
    * snapshot keeps each key's LATEST operation in (ts, event_id)
    * order and drops keys whose latest op is the tombstone. One
    * per-key window pick (WindowGroupLimit — candidates prune during
    * the shuffle), no join: apply cost is O(log), the replication
    * pattern at any scale. The carried `value` is passthrough, never
    * re-accumulated — hash-exact. */
  def cdcApply(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val log = events.withColumn("op",
      when(col("event_type") === "signup", "I")
        .when(col("event_type") === "error", "D")
        .otherwise("U"))
    log
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("event_id").as("last_event"),
        col("op").as("last_op"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  val cdcApplySql: String =
    """WITH log AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN event_type = 'signup' THEN 'I'
      |         WHEN event_type = 'error' THEN 'D'
      |         ELSE 'U' END AS op
      |  FROM events),
      |r AS (
      |  SELECT user_id, event_id, op, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM log)
      |SELECT user_id, event_id AS last_event, op AS last_op,
      |       value AS last_value
      |FROM r WHERE rn = 1 AND op <> 'D'
      |ORDER BY user_id""".stripMargin

  /** Point-in-time ("time travel") queries over the SCD2 history — the
    * question the history exists to answer: the dimension AS OF a date
    * is the rows whose validity interval covers it (`valid_from <= d <
    * valid_to`, open intervals unbounded). Two snapshots in one result:
    * one BETWEEN the base load and the update (old versions visible,
    * new keys absent), one after (new versions + new keys) — every
    * interval arm of the merge is exercised by construction.
    *
    * Scale shape: a snapshot is ONE narrow filter over the history
    * table — no join, no window; with the history partitioned on
    * valid_from (the natural layout) the predicate prunes partitions. */
  def scd2Snapshots(hist: DataFrame, dates: Seq[String]): DataFrame =
    dates.map { at =>
      val d = to_date(lit(at))
      hist.filter(col("valid_from") <= d &&
          (col("valid_to").isNull || col("valid_to") > d))
        .select(lit(at).as("snapshot_date"), col("c_custkey"),
          col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    }.reduce(_ unionByName _)
      .orderBy(col("snapshot_date"), col("c_custkey"))

  val scd2SnapshotDates = Seq("2024-03-15", "2024-07-01")

  lazy val scd2SnapshotsSql: String = {
    val tail =
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
        |       valid_from, valid_to, is_current
        |FROM hist ORDER BY c_custkey, valid_from""".stripMargin
    val arms = scd2SnapshotDates.map { at =>
      s"""SELECT '$at' AS snapshot_date, c_custkey, c_name, c_acctbal, c_mktsegment
         |FROM hist
         |WHERE valid_from <= DATE '$at'
         |  AND (valid_to IS NULL OR valid_to > DATE '$at')""".stripMargin
    }.mkString("\nUNION ALL\n")
    scd2CustomerSql.replace(tail,
      s"$arms\nORDER BY snapshot_date, c_custkey")
  }

  /** Retroactive (late-arriving) SCD2 correction — the bi-temporal
    * repair a warehouse runs when a fact turns out to have been wrong
    * IN THE PAST: a correction (key, new value, effective date) splits
    * the history interval COVERING the effective date — the prefix
    * keeps the observed values and closes at the date (no longer
    * current), the suffix carries the corrected values and inherits
    * the interval's end and currency — while every other interval,
    * including later REAL versions (observed afterwards, already
    * reality), passes through untouched. Correction set here:
    * keys ≡ 3 (mod 11), acctbal + 55, effective `retroEffective`.
    *
    * Scale shape: one broadcastable key-set membership test + a
    * narrow two-arm projection of covering rows; the history is
    * scanned once, nothing shuffles but the final sort. */
  def retroCorrection(hist: DataFrame, eff: String): DataFrame = {
    val e = to_date(lit(eff))
    val isCorr = col("c_custkey") % 11 === 3
    val covers = isCorr && col("valid_from") <= e &&
      (col("valid_to").isNull || col("valid_to") > e)
    val prefix = hist.filter(covers)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"), col("valid_from"), e.as("valid_to"),
        lit(false).as("is_current"))
    val suffix = hist.filter(covers)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 55.0).as("c_acctbal"), col("c_mktsegment"),
        e.as("valid_from"), col("valid_to"), col("is_current"))
    hist.filter(!covers)
      .unionByName(prefix).unionByName(suffix)
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  val retroEffective = "2024-03-01"

  lazy val retroCorrectionSql: String = {
    val tail =
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
        |       valid_from, valid_to, is_current
        |FROM hist ORDER BY c_custkey, valid_from""".stripMargin
    scd2CustomerSql.replace(tail,
      s"""SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         |       valid_from, valid_to, is_current
         |FROM hist
         |WHERE NOT (c_custkey % 11 = 3 AND valid_from <= DATE '$retroEffective'
         |           AND (valid_to IS NULL OR valid_to > DATE '$retroEffective'))
         |UNION ALL
         |SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         |       valid_from, DATE '$retroEffective', FALSE
         |FROM hist
         |WHERE c_custkey % 11 = 3 AND valid_from <= DATE '$retroEffective'
         |  AND (valid_to IS NULL OR valid_to > DATE '$retroEffective')
         |UNION ALL
         |SELECT c_custkey, c_name, c_acctbal + 55.0, c_mktsegment,
         |       DATE '$retroEffective', valid_to, is_current
         |FROM hist
         |WHERE c_custkey % 11 = 3 AND valid_from <= DATE '$retroEffective'
         |  AND (valid_to IS NULL OR valid_to > DATE '$retroEffective')
         |ORDER BY c_custkey, valid_from""".stripMargin)
  }

  /** Retention-expiry planning over the SCD2 history — the governance
    * pass a regulated store runs BEFORE a destructive vacuum: with a
    * retention cutoff, a history row is expirable iff its validity
    * ended at-or-before the cutoff (closed AND stale; open rows and
    * rows still valid past the cutoff are retained). The plan reports,
    * per segment, row counts both ways plus how many KEYS lose at
    * least one version — the blast-radius numbers a reviewer signs
    * off, computed without touching any data file (one aggregate over
    * the history; with the history partitioned on valid_from the
    * expirable scan prunes partitions). */
  def retentionExpiry(hist: DataFrame, cutoff: String): DataFrame = {
    val d = to_date(lit(cutoff))
    val exp = col("valid_to").isNotNull && col("valid_to") <= d
    hist
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(exp, 1L).otherwise(0L)).as("n_expire"),
        sum(when(exp, 0L).otherwise(1L)).as("n_keep"),
        countDistinct(when(exp, col("c_custkey"))).as("n_keys_with_expiry"))
      .orderBy(col("c_mktsegment"))
  }

  val retentionCutoff = "2024-06-01"

  lazy val retentionExpirySql: String = {
    val tail =
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
        |       valid_from, valid_to, is_current
        |FROM hist ORDER BY c_custkey, valid_from""".stripMargin
    scd2CustomerSql.replace(tail,
      s"""SELECT c_mktsegment, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN valid_to IS NOT NULL
         |       AND valid_to <= DATE '$retentionCutoff'
         |       THEN 1 ELSE 0 END) AS BIGINT) AS n_expire,
         |  CAST(SUM(CASE WHEN valid_to IS NOT NULL
         |       AND valid_to <= DATE '$retentionCutoff'
         |       THEN 0 ELSE 1 END) AS BIGINT) AS n_keep,
         |  CAST(COUNT(DISTINCT CASE WHEN valid_to IS NOT NULL
         |       AND valid_to <= DATE '$retentionCutoff'
         |       THEN c_custkey END) AS BIGINT) AS n_keys_with_expiry
         |FROM hist GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin)
  }

  /** Row-level quarantine routing — the per-row complement of
    * `rel/Quality.dqAudit`'s aggregate report: every fact row violating
    * a release policy is routed out with the FULL list of reasons it
    * tripped (a row can trip several), so the quarantine table is
    * directly actionable and replayable after fix-up. Reasons join in a
    * fixed declaration order via concat_ws (null-skipping in both
    * engines) — no sorting, no nondeterminism. The check is one narrow
    * scan-side filter: zero shuffles before the output sort, trivially
    * partition-parallel at any scale, and the pass-through side (the
    * complement) is the same filter negated. Rules are calibrated so
    * single-reason and multi-reason rows both exist in the fixture
    * (889 rows trip ≥ 2 rules at sf0.01). */
  def quarantineLineitems(lineitem: DataFrame): DataFrame = {
    val highDisc = col("l_discount") > 0.08
    val qtyCap = col("l_quantity") > 45
    val returned = col("l_returnflag") === "R"
    lineitem
      .filter(highDisc || qtyCap || returned)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"), col("l_returnflag"),
        concat_ws(",",
          when(highDisc, lit("high_discount")),
          when(qtyCap, lit("qty_cap")),
          when(returned, lit("returned"))).as("reasons"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_returnflag"))
  }

  val quarantineLineitemsSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag,
      |  concat_ws(',',
      |    CASE WHEN l_discount > 0.08 THEN 'high_discount' END,
      |    CASE WHEN l_quantity > 45 THEN 'qty_cap' END,
      |    CASE WHEN l_returnflag = 'R' THEN 'returned' END) AS reasons
      |FROM lineitem
      |WHERE l_discount > 0.08 OR l_quantity > 45 OR l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin

  /** Right-to-be-forgotten erasure audit: given a deletion cohort (here
    * custkey ≡ 0 mod 97 — a data-derived stand-in for the legal request
    * list), report per table how many rows the erasure removes and how
    * many remain — the compliance artifact a DSAR pipeline emits BEFORE
    * the destructive pass runs. Customer rows match directly; orders
    * via their FK; lineitem transitively through its order. Each arm is
    * one aggregate with a membership flag (the cohort predicate pushes
    * into the scan for customer/orders; lineitem's membership travels
    * through one orderkey join that AQE sizes) — no row-level output,
    * so the report costs three scans regardless of cohort size. */
  def erasureAudit(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    def arm(table: String, df: DataFrame, isMember: Column) = df
      .agg(count(lit(1)).as("n_before"),
        sum(isMember.cast("long")).as("n_erased"))
      .select(lit(table).as("table_name"),
        col("n_before"),
        coalesce(col("n_erased"), lit(0L)).as("n_erased"),
        (col("n_before") - coalesce(col("n_erased"), lit(0L))).as("n_after"))
    val c = arm("customer", customer, col("c_custkey") % 97 === 0)
    val o = arm("orders", orders, col("o_custkey") % 97 === 0)
    val erasedOrders = orders.filter(col("o_custkey") % 97 === 0)
      .select(col("o_orderkey"))
    val l = arm("lineitem",
      lineitem.join(erasedOrders.withColumn("m", lit(1)),
        col("l_orderkey") === col("o_orderkey"), "left"),
      col("m").isNotNull)
    c.unionByName(o).unionByName(l).orderBy(col("table_name"))
  }

  val erasureAuditSql: String =
    """WITH c AS (
      |  SELECT 'customer' AS table_name, COUNT(*) AS n_before,
      |    CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_erased
      |  FROM customer),
      |o AS (
      |  SELECT 'orders', COUNT(*),
      |    CAST(SUM(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders),
      |l AS (
      |  SELECT 'lineitem', COUNT(*),
      |    CAST(SUM(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
      |         AS BIGINT)
      |  FROM lineitem li
      |  LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_custkey % 97 = 0) o
      |    ON li.l_orderkey = o.o_orderkey),
      |u AS (SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l)
      |SELECT table_name, n_before, n_erased, n_before - n_erased AS n_after
      |FROM u ORDER BY table_name""".stripMargin

  /** Backfill batch plan: slice a historical reload into contiguous
    * date batches of bounded row volume — the ops artifact that decides
    * how many days each backfill job may claim so no single run blows
    * its memory/SLA envelope. batch_id = cumulative-rows-before div
    * budget (greedy contiguous packing: a batch may overflow by at most
    * one day, the standard bin rule when days are atomic). The running
    * sum is a window over the ≤|days| daily aggregate — bounded by the
    * calendar, never by fact rows. */
  def backfillPlan(orders: DataFrame, budget: Long): DataFrame = {
    val daily = orders.groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_rows"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    daily
      .withColumn("cum_before", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .select(col("day"), col("n_rows"),
        expr(s"cum_before div $budget").as("batch_id"),
        (col("cum_before") + col("n_rows")).as("cum_rows"))
      .orderBy(col("day"))
  }

  def backfillPlanSql(budget: Long): String =
    s"""WITH daily AS (
       |  SELECT o_orderdate AS day, COUNT(*) AS n_rows
       |  FROM orders GROUP BY 1),
       |plan AS (
       |  SELECT day, n_rows,
       |    CAST(COALESCE(SUM(n_rows) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_before
       |  FROM daily)
       |SELECT day, n_rows, cum_before // $budget AS batch_id,
       |  cum_before + n_rows AS cum_rows
       |FROM plan ORDER BY day""".stripMargin

  def queries: Seq[(String, QueryDef)] = Seq(
    "etl_erasure" -> QueryDef(
      (s, d) => erasureAudit(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d)),
      erasureAuditSql),
    "etl_backfill_plan" -> QueryDef(
      (s, d) => backfillPlan(Tables.orders(s, d), budget = 5000L),
      backfillPlanSql(5000L)),
    "etl_quarantine" -> QueryDef(
      (s, d) => quarantineLineitems(Tables.lineitem(s, d)),
      quarantineLineitemsSql),
    "etl_retro_correction" -> QueryDef(
      (s, d) => retroCorrection(scd2Customer(Tables.customer(s, d)),
        retroEffective),
      retroCorrectionSql),
    "etl_retention_expiry" -> QueryDef(
      (s, d) => retentionExpiry(scd2Customer(Tables.customer(s, d)),
        retentionCutoff),
      retentionExpirySql),
    "etl_time_travel" -> QueryDef(
      (s, d) => scd2Snapshots(scd2Customer(Tables.customer(s, d)),
        scd2SnapshotDates),
      scd2SnapshotsSql),
    "etl_cdc_apply" -> QueryDef(
      (s, d) => cdcApply(Tables.events(s, d)), cdcApplySql),
    "scd2_merge" -> QueryDef(
      (s, d) => scd2Customer(Tables.customer(s, d)), scd2CustomerSql),
    "etl_diff" -> QueryDef(
      (s, d) => diffCustomer(Tables.customer(s, d)), diffCustomerSql),
    "agg_incremental" -> QueryDef(
      (s, d) => incrementalOrderStats(Tables.orders(s, d), "1996-06-01"),
      incrementalOrderStatsSql),
    "etl_upsert" -> QueryDef(
      (s, d) => upsertCustomer(Tables.customer(s, d)), upsertCustomerSql),
    "etl_schema_evolution" -> QueryDef(
      (s, d) => mergeEvolvedSnapshots(Tables.orders(s, d)),
      mergeEvolvedSnapshotsSql))

  /** Schema-evolution merge — the table-format headline feature as an
    * operator: three snapshot generations of the same logical table,
    * each adding a column (v1: key+price, v2: +status, v3: +priority),
    * union BY NAME with missing columns null-backfilled and per-row
    * snapshot provenance. `unionByName(allowMissingColumns = true)` is
    * the whole mechanism — resolution is by column NAME at plan time,
    * so a reader written against the newest schema consumes every
    * vintage, exactly how parquet-backed tables evolve at scale (no
    * rewrite of old files, a narrow projection per side, zero shuffle
    * before the final sort). */
  def mergeEvolvedSnapshots(orders: DataFrame): DataFrame = {
    val v1 = orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("snapshot_v", lit(1))
    val v2 = orders.filter(col("o_orderkey") % 3 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .withColumn("snapshot_v", lit(2))
    val v3 = orders.filter(col("o_orderkey") % 3 === 2)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderpriority"))
      .withColumn("snapshot_v", lit(3))
    v1.unionByName(v2, allowMissingColumns = true)
      .unionByName(v3, allowMissingColumns = true)
      .select(col("o_orderkey"), col("snapshot_v"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  private def mergeEvolvedSnapshotsSql: String =
    """SELECT o_orderkey, snapshot_v, o_totalprice, o_orderstatus,
      |       o_orderpriority
      |FROM (
      |  SELECT o_orderkey, 1 AS snapshot_v, o_totalprice,
      |         CAST(NULL AS VARCHAR) AS o_orderstatus,
      |         CAST(NULL AS VARCHAR) AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 2, o_totalprice, o_orderstatus,
      |         CAST(NULL AS VARCHAR)
      |  FROM orders WHERE o_orderkey % 3 = 1
      |  UNION ALL
      |  SELECT o_orderkey, 3, o_totalprice, o_orderstatus, o_orderpriority
      |  FROM orders WHERE o_orderkey % 3 = 2)
      |ORDER BY o_orderkey""".stripMargin
}
