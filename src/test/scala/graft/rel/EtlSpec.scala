package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SCD2 merge + incremental aggregate maintenance (rel/Etl). */
class EtlSpec extends SparkSuite {

  private def dim(rows: Seq[(Long, String, java.lang.Double)]) = {
    import spark.implicits._
    rows.toDF("k", "name", "bal")
  }

  test("scd2Merge: change closes + reopens, no-op passes, new inserts, untouched keeps") {
    val base = dim(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    val upd  = dim(Seq((1L, "a2", 10.0),   // changed name
      (2L, "b", 20.0),                     // no-op
      (9L, "z", 0.0)))                     // new key
    val out = Etl.scd2Merge(base, upd, "k", Seq("name", "bal"),
      "2024-01-01", "2024-06-01").collect()
      .map(r => (r.getLong(0), r.getString(1),
        String.valueOf(r.getDate(3)), String.valueOf(r.getDate(4)),
        r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, "a", "2024-01-01", "2024-06-01", false),
      (1L, "a2", "2024-06-01", "null", true),
      (2L, "b", "2024-01-01", "null", true),   // no-op: still one open row
      (3L, "c", "2024-01-01", "null", true),   // untouched
      (9L, "z", "2024-06-01", "null", true)))  // insert
  }

  test("scd2Merge: null attribute values compare null-safely") {
    val base = dim(Seq((1L, null, 10.0), (2L, null, 20.0)))
    val upd  = dim(Seq((1L, null, 10.0),  // null == null → no-op
      (2L, "now-set", 20.0)))             // null → value = change
    val out = Etl.scd2Merge(base, upd, "k", Seq("name", "bal"),
      "2024-01-01", "2024-06-01").collect()
    assert(out.count(_.getLong(0) == 1L) == 1, "null==null is a no-op")
    assert(out.count(_.getLong(0) == 2L) == 2, "null→value is a change")
  }

  test("scd2Merge: exactly one current row per key, history never overlaps") {
    val out = Etl.scd2Customer(graft.core.Tables.customer(spark, sfDir))
    val perKey = out.groupBy("c_custkey")
      .agg(sum(col("is_current").cast("int")).as("n_current"),
        count(lit(1)).as("n_rows"))
    assert(perKey.filter(col("n_current") =!= 1).count() == 0,
      "every key has exactly one open version")
    // closed rows end exactly where the replacement begins
    val closed = out.filter(!col("is_current"))
      .select(col("c_custkey"), col("valid_to").as("t"))
    val opened = out.filter(col("is_current"))
      .select(col("c_custkey"), col("valid_from").as("f"))
    val bad = closed.join(opened, Seq("c_custkey"))
      .filter(col("t") =!= col("f")).count()
    assert(bad == 0, "no gaps or overlaps in validity ranges")
  }

  test("time travel: the early snapshot sees old versions and no new keys; " +
      "the late one sees updates and inserts") {
    val hist = Etl.scd2Customer(graft.core.Tables.customer(spark, sfDir))
    val snaps = Etl.scd2Snapshots(hist, Etl.scd2SnapshotDates)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val (early, late) = snaps.partition(_._1 == "2024-03-15")
    assert(early.nonEmpty && late.nonEmpty)
    assert(!early.exists(_._2 < 0), "new keys must not exist before the update")
    assert(late.count(_._2 < 0) == 3, "all three inserts visible after")
    assert(!early.exists(_._3.startsWith("UPD ")), "early snapshot is pre-update")
    val changed = late.filter(t => t._2 > 0 && t._2 % 7 == 0)
    assert(changed.nonEmpty && changed.forall(_._3.startsWith("UPD ")),
      "late snapshot carries the new versions")
    // a snapshot is a consistent dimension: exactly one row per key
    Seq(early, late).foreach { s =>
      assert(s.map(_._2).distinct.length == s.length, "one row per key") }
  }

  test("upsertLatest: updates win, inserts land, base carries, idempotent") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "v", "x")
    val batch = Seq((2L, "B", 20.0), (3L, "c", 3.0)).toDF("k", "v", "x")
    val once = Etl.upsertLatest(base, batch, "k")
    assert(once.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0)))
    // re-applying the same batch changes nothing (snapshot semantics)
    val twice = Etl.upsertLatest(once, batch, "k")
    assert(twice.exceptAll(once).count() === 0 &&
      once.exceptAll(twice).count() === 0)
  }

  test("tableDiff: every status classifies correctly, null-safe compare") {
    import spark.implicits._
    val before = Seq((1L, Option("a")), (2L, Option("b")), (3L, None),
      (4L, Option("gone"))).toDF("k", "v")
    val after = Seq((1L, Option("a")), (2L, Option("B")), (3L, None),
      (5L, Option("new"))).toDF("k", "v")
    val got = Etl.tableDiff(before, after, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 3 (null == null, null-safe) joins 1 as unchanged
    assert(got === Map(
      "added" -> (1L, 5L), "removed" -> (1L, 4L),
      "changed" -> (1L, 2L), "unchanged" -> (2L, 1L)))
  }

  test("incrementalOrderStats: partial-merge equals full recompute at any cutoff") {
    val orders = graft.core.Tables.orders(spark, sfDir)
    val full = Etl.incrementalOrderStats(orders, "1900-01-01") // all in delta
    for (cutoff <- Seq("1995-06-01", "1996-06-01", "2099-01-01")) {
      val inc = Etl.incrementalOrderStats(orders, cutoff)
      assert(inc.exceptAll(full).count() == 0 &&
        full.exceptAll(inc).count() == 0,
        s"cutoff $cutoff diverges from full recompute")
    }
  }

  test("quarantine: reasons list every tripped rule in declaration order; " +
      "quarantine + pass-through partition the table exactly") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val q = Etl.quarantineLineitems(li)
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = Seq(
        if (r.getDouble(3) > 0.08) Some("high_discount") else None,
        if (r.getDouble(2) > 45) Some("qty_cap") else None,
        if (r.getString(4) == "R") Some("returned") else None
      ).flatten.mkString(",")
      assert(r.getString(5) === expect, s"reason mismatch: $r")
      assert(expect.nonEmpty, "no quarantined row without a reason")
    }
    // multi-reason rows must exist (the arm a single-rule fixture misses)
    assert(rows.exists(_.getString(5).contains(",")))
    // partition property: quarantined + clean = all, disjoint
    val clean = li.filter(!(col("l_discount") > 0.08 ||
      col("l_quantity") > 45 || col("l_returnflag") === "R"))
    assert(q.count() + clean.count() === li.count())
  }

  test("retro correction: covering intervals split losslessly, later " +
      "real versions untouched, timeline stays gap-free") {
    val hist = Etl.scd2Customer(
      graft.core.Tables.customer(spark, sfDir)).localCheckpoint(true)
    val out = Etl.retroCorrection(hist, Etl.retroEffective)
      .localCheckpoint(true)
    val eff = java.sql.Date.valueOf(Etl.retroEffective)
    val isCorr = col("c_custkey") % 11 === 3
    val covers = isCorr && col("valid_from") <= eff &&
      (col("valid_to").isNull || col("valid_to") > eff)
    val nCover = hist.filter(covers).count()
    assert(nCover > 0, "fixture must exercise the split arm")
    // each covering row becomes exactly two
    assert(out.count() === hist.count() + nCover)
    // suffix rows carry the corrected balance and inherit currency
    val sample = hist.filter(covers).limit(1).head()
    val key = sample.getLong(0)
    val segs = out.filter(col("c_custkey") === key)
      .orderBy(col("valid_from")).collect()
    val prefix = segs.find(r => r.getDate(5) == eff).get
    val suffix = segs.find(r => r.getDate(4) == eff).get
    assert(!prefix.getBoolean(6), "prefix can never be current")
    assert(suffix.getDouble(2) === sample.getDouble(2) + 55.0)
    // gap-free: the split boundary is shared exactly
    assert(prefix.getDate(5) === suffix.getDate(4))
    // uncorrected keys are byte-identical
    val a = hist.filter(!isCorr).collect().map(_.toSeq)
      .sortBy(_.toString)
    val b = out.filter(!isCorr).collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b)
  }

  test("retention expiry: rows conserve, expirable = closed-and-stale, " +
      "key counts match a direct recompute") {
    val hist = Etl.scd2Customer(
      graft.core.Tables.customer(spark, sfDir)).localCheckpoint(true)
    val plan = Etl.retentionExpiry(hist, Etl.retentionCutoff).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1),
        "expire + keep must conserve rows")
    }
    val direct = hist.filter(col("valid_to").isNotNull &&
      col("valid_to") <= to_date(lit(Etl.retentionCutoff)))
    assert(plan.map(_.getLong(2)).sum === direct.count())
    assert(plan.map(_.getLong(4)).sum ===
      direct.select("c_custkey").distinct().count(),
      "per-segment key counts sum to the distinct expirable keys " +
        "(segments partition keys in this history)")
  }

  /** Erasure cohort = custkey ≡ 0 mod 97: one matching customer with
    * two of three orders; lineitem erasure is TRANSITIVE through the
    * order, so 3 of 4 line rows go. */
  test("erasure audit: exact per-table counts incl. the transitive arm") {
    import spark.implicits._
    val customer = Seq(97L, 1L, 2L).toDF("c_custkey")
    val orders = Seq((1L, 97L), (2L, 1L), (3L, 97L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(1L, 1L, 2L, 3L).toDF("l_orderkey")
    val got = Etl.erasureAudit(customer, orders, li)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("customer", 3L, 1L, 2L),
      ("lineitem", 4L, 3L, 1L),
      ("orders", 3L, 2L, 1L)))
  }

  /** Budget 4 over daily volumes 3/3/2: the second day still fits batch
    * 0 (cum_before 3 < 4), the third opens batch 1 (cum_before 6). */
  test("backfill plan: greedy contiguous batches, exact boundaries") {
    import spark.implicits._
    import java.sql.Date
    val orders = (Seq.fill(3)("2024-01-01") ++ Seq.fill(3)("2024-01-02") ++
      Seq.fill(2)("2024-01-03")).map(Date.valueOf).toDF("o_orderdate")
    val got = Etl.backfillPlan(orders, budget = 4L)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 3L, 0L, 3L),
      ("2024-01-02", 3L, 0L, 6L),
      ("2024-01-03", 2L, 1L, 8L)))
  }
}
