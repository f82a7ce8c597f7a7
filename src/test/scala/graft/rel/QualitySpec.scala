package graft.rel

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Data-quality audit (rel/Quality): planted violations must fire their
  * checks — a suite that only ever sees clean data would vacuously pass
  * a broken evaluator (the pii_redact planted-input reasoning). */
class QualitySpec extends SparkSuite {
  import spark.implicits._

  private val ts = Timestamp.valueOf("1995-01-01 00:00:00")

  test("clean fixture: every check ok") {
    val rep = Quality.dqAudit(
      graft.core.Tables.lineitem(spark, sfDir),
      graft.core.Tables.orders(spark, sfDir))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep.size === 6)
    assert(rep.values.forall(identity), s"clean data must pass all checks: $rep")
  }

  test("profileColumns: nulls, distincts and extrema per column") {
    val orders = Seq(
      (Option(1L), Option("O"), Option(10.0), Option("1-URGENT")),
      (Option(2L), Option("F"), Option(20.5), None),
      (Option(1L), None, Option(20.5), Option("5-LOW")))
      .toDF("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    val got = Quality.profileColumns(orders)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(got("o_custkey") === (0L, 2L, "1", "2"))
    assert(got("o_orderstatus") === (1L, 2L, "F", "O"))
    assert(got("o_totalprice") === (0L, 2L, "10.0", "20.5"))
    assert(got("o_orderpriority") === (1L, 2L, "1-URGENT", "5-LOW"))
  }

  test("planted violations fire their checks and only theirs") {
    val orders = Seq.tabulate(1200)(i => (i.toLong, "O"))
      .toDF("o_orderkey", "o_orderstatus")
      // duplicate PK
      .unionByName(Seq((5L, "O")).toDF("o_orderkey", "o_orderstatus"))
    val li = Seq(
      (1L, 1.0, 0.05, ts),                          // clean
      (99999L, 1.0, 0.05, ts),                      // FK orphan
      (2L, -3.0, 0.05, ts),                         // non-positive qty
      (3L, 1.0, 0.95, ts),                          // discount out of range
      (4L, 1.0, 0.05, null.asInstanceOf[Timestamp]) // null shipdate
    ).toDF("l_orderkey", "l_quantity", "l_discount", "l_shipdate")
    val rep = Quality.dqAudit(li, orders)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
      .map(t => t._1 -> t).toMap
    assert(!rep("orders.pk_unique")._3 && rep("orders.pk_unique")._2 === 1.0)
    assert(rep("orders.row_floor")._3)
    assert(!rep("lineitem.fk_orders")._3 && rep("lineitem.fk_orders")._2 === 1.0)
    assert(!rep("lineitem.quantity_positive")._3)
    assert(!rep("lineitem.discount_in_range")._3)
    // 1 null out of 5 rows = 20% > 1%
    assert(!rep("lineitem.shipdate_null_rate")._3)
  }

  /** Every drift arm must fire by construction, at any SF: all four
    * row statuses present, priority null-rate strictly up, totalprice
    * extrema moved in both directions, status/custkey distincts grew. */
  test("profile drift fires every detector arm") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val rep = Quality.profileDrift(orders)
      .collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         r.getDouble(2)))
      .toMap
    Seq("rows.added", "rows.removed", "rows.changed", "rows.unchanged")
      .foreach(s => assert(rep(s)._2 > 0, s"$s did not fire"))
    assert(rep("rows.added")._2 === 5.0)
    def delta(m: String) = rep(m)._2 - rep(m)._1.get
    assert(delta("null_rate.o_orderpriority") > 0, "null-rate drift missing")
    assert(delta("max.o_totalprice") > 900000, "max drift missing")
    assert(delta("min.o_totalprice") < 0, "min drift missing")
    assert(delta("n_distinct.o_orderstatus") === 1.0, "'X' status not new")
    assert(delta("min.o_custkey") < 0, "custkey -1 min drift missing")
  }

  test("k-anonymity: small classes flag k-risk, band-concentrated " +
      "sensitive values flag l-risk, banding is floor(acctbal/1000)") {
    val customers = Seq(
      // class (1,A): 2 rows < k=3 → k_risk; bands {0,1} ≥ l=2 → no l_risk
      (1, "A", 500.0), (1, "A", 1500.0),
      // class (1,B): 3 rows, bands {0,1,2} → clean
      (1, "B", 100.0), (1, "B", 1100.0), (1, "B", 2100.0),
      // class (2,A): 3 rows all in band 0 → l_risk only
      (2, "A", 10.0), (2, "A", 20.0), (2, "A", 999.99))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Quality.kAnonymity(customers, k = 3, l = 2)
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(got((1, "A")) === ((2L, 2L, true, false)))
    assert(got((1, "B")) === ((3L, 3L, false, false)))
    assert(got((2, "A")) === ((3L, 1L, false, true)))
  }

  test("referential audit: planted orphan and NULL FK count separately, " +
      "clean arms stay ok") {
    val tables = Map(
      "region"   -> Seq((0L, "R0")).toDF("r_regionkey", "r_name"),
      "nation"   -> Seq((0L, 0L), (1L, 0L)).toDF("n_nationkey", "n_regionkey"),
      "customer" -> Seq((10L, 0L), (11L, 1L)).toDF("c_custkey", "c_nationkey"),
      "supplier" -> Seq((20L, 0L)).toDF("s_suppkey", "s_nationkey"),
      "part"     -> Seq((30L, "p")).toDF("p_partkey", "p_name"),
      "orders"   -> Seq((40L, Option(10L)), (41L, Option(99L)), // 99 = orphan
        (42L, Option.empty[Long]))                              // NULL FK
        .toDF("o_orderkey", "o_custkey"),
      "lineitem" -> Seq((40L, 30L, 20L), (40L, 30L, 20L))
        .toDF("l_orderkey", "l_partkey", "l_suppkey"))
    val got = Quality.referentialAuditOver(tables(_))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got.size === 7)
    assert(got("orders.o_custkey->customer") === ((3L, 1L, 1L, false)),
      "one orphan and one NULL FK, counted separately")
    (got - "orders.o_custkey->customer").foreach { case (rel, (_, o, n, ok)) =>
      assert(o === 0L && n === 0L && ok, s"clean arm $rel must pass")
    }
  }

  test("benford audit: planted all-digit-1 population deviates hard at 1, " +
      "zero-count digits still report") {
    val orders = Seq.tabulate(8)(i => 100.0 + i) // all totals start with 1
      .toDF("o_totalprice")
    val got = Quality.benfordAudit(orders)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === (1 to 9).toSet, "all 9 digits present")
    assert(got(1)._1 === 8L && got(1)._2 === 1000000L)
    assert(got(1)._4 === 1000000L - 301030L, "dev = obs - expected ppm")
    (2 to 9).foreach { d =>
      assert(got(d)._1 === 0L && got(d)._2 === 0L, s"digit $d zero-observed")
    }
    // sub-cent guard: 0.004 rounds to 0 cents and is filtered, not a crash
    val tiny = Seq(0.004, 1234.56).toDF("o_totalprice")
    val g2 = Quality.benfordAudit(tiny).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(g2(1) === 1L && g2.values.sum === 1L)
  }

  test("freshness: staleness anchors on the freshest type, a silent " +
      "topic past the lag bound flags, micros are exact") {
    val e = Seq(
      (1L, "2024-03-10 12:00:00.000001", "live"),
      (2L, "2024-03-10 11:00:00",        "live"),
      (3L, "2024-03-08 12:00:00.000001", "dead")) // 48h stale exactly
      .map { case (id, t, ty) => (id, Timestamp.valueOf(t), ty) }
      .toDF("event_id", "ts", "event_type")
    val got = Quality.freshness(e, maxLagHours = 48)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap
    assert(got("live") === ((2L, 0L, true)))
    assert(got("dead")._2 === 48L * 3600000000L,
      "staleness is exact integer micros against the anchor")
    assert(got("dead")._3 === true, "<= bound is inclusive")
    val g2 = Quality.freshness(e, maxLagHours = 47)
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(g2("dead") === false, "past the bound flags")
  }

  test("ks drift: disjoint populations hit 1e6 ppm at the right bin, " +
      "identical populations score zero") {
    def ev(rows: (Long, String, Double)*) =
      rows.toDF("event_id", "tss", "value")
        .select(col("event_id"), to_timestamp(col("tss")).as("ts"),
          col("value"))
    // 2024-01-01 = Monday, 2024-01-06 = Saturday. Weekday values all
    // 1.00, weekend all 2.00 → cmax 200, w = 4, weekday mass ends at
    // bin 25 where the full CDF gap opens: D/n1n2 = 1 → 1e6 ppm
    val disjoint = ev(
      (1L, "2024-01-01 10:00:00", 1.00), (2L, "2024-01-01 11:00:00", 1.00),
      (3L, "2024-01-06 10:00:00", 2.00), (4L, "2024-01-06 11:00:00", 2.00))
    val d = Quality.ksDrift(disjoint).head()
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3)) ===
      ((2L, 2L, 1000000L, 25L)))
    // same values on both sides: every cross-multiplied gap is zero
    val same = ev(
      (1L, "2024-01-01 10:00:00", 1.00), (2L, "2024-01-01 11:00:00", 2.00),
      (3L, "2024-01-06 10:00:00", 1.00), (4L, "2024-01-06 11:00:00", 2.00))
    assert(Quality.ksDrift(same).head().getLong(2) === 0L)
  }

  test("ks drift is bit-identical across partitionings") {
    val e = graft.core.Tables.events(spark, sfDir)
    def run(parts: Int) =
      Quality.ksDrift(e.repartition(parts)).collect().map(_.toSeq).toSeq
    assert(run(2) === run(16))
  }

  /** Planted key/FD violations must fire exactly their own checks:
    * duplicate orderkey breaks both orders key probes it touches, a
    * custkey ordering twice on one date breaks the composite key, a
    * custkey with two priorities breaks the FD, and a duplicated
    * (orderkey, linenumber) breaks the lineitem PK. */
  test("key discovery: planted duplicates and FD breaks fire") {
    import spark.implicits._
    import java.sql.Date
    val d = Date.valueOf("1995-01-01")
    val orders = Seq(
      (1L, 10L, d, "1-URGENT"),
      (1L, 11L, d, "1-URGENT"),            // dup o_orderkey
      (2L, 12L, d, "1-URGENT"),
      (3L, 12L, d, "5-LOW"))               // dup (custkey, date) + FD break
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Seq((1L, 1), (1L, 1), (2L, 1))  // dup composite PK
      .toDF("l_orderkey", "l_linenumber")
    val got = Quality.keyDiscovery(orders, li)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(got("orders.key:o_orderkey") === ((1.0, false)))
    assert(got("orders.key:o_custkey") === ((1.0, false)))
    assert(got("orders.key:o_custkey+o_orderdate") === ((1.0, false)))
    assert(got("lineitem.key:l_orderkey+l_linenumber") === ((1.0, false)))
    assert(got("orders.fd:o_custkey->o_orderpriority") === ((1.0, false)))
  }

  test("key discovery: fixture verdicts — orderkey IS a key, the synthetic " +
      "lineitem composite is NOT (the discovery's whole point)") {
    val got = Quality.keyDiscovery(
      graft.core.Tables.orders(spark, sfDir),
      graft.core.Tables.lineitem(spark, sfDir))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(got("orders.key:o_orderkey"))
    // the driver's synthetic lineitem reuses line numbers within an
    // order — a candidate key a profiler must REJECT, not assume
    assert(!got("lineitem.key:l_orderkey+l_linenumber"))
  }

  /** Content checksum equals a driver-side md5 recompute and is
    * invariant to partitioning (the order-free residue-sum property the
    * manifest exists for). */
  test("content checksum: md5 recompute equality, partition invariance") {
    import spark.implicits._
    val docs = Seq((1L, "s0", "alpha"), (2L, "s0", "beta"), (3L, "s1", "gamma"))
      .toDF("doc_id", "source", "text")
    def res(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1000000000L
    }
    val got = Quality.contentChecksum(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("s0", 2L, 9L, res("alpha") + res("beta")),
      ("s1", 1L, 5L, res("gamma"))))
    val rep = Quality.contentChecksum(docs.repartition(5))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSeq === got.toSeq)
  }

  /** Lateness: arrival order is event_id; an event behind the running
    * event-time max is late by the exact gap, the first event never is,
    * and types audit independently. */
  test("lateness audit: exact micro gaps against the running max") {
    val e = Seq(
      (1L, "2024-01-01 10:00:00", "a"),
      (2L, "2024-01-01 10:05:00", "a"),
      (3L, "2024-01-01 10:03:00", "a"),   // 2 min late
      (4L, "2024-01-01 10:05:00", "a"),   // ties are not late
      (5L, "2024-01-01 09:00:00", "b"))   // first of its type: on time
      .map { case (id, t, ty) => (id, Timestamp.valueOf(t), ty) }
      .toDF("event_id", "ts", "event_type")
    val got = Quality.latenessAudit(e)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("a", 4L, 1L, 120000000L, 120000000L),
      ("b", 1L, 0L, 0L, 0L)))
  }

  test("join-size forecast: degree products, skewed key surfaces") {
    import spark.implicits._
    // orderkey join: orders {1,2}, lineitem {1:3 rows, 2:1 row} →
    // predicted 3+1 = 4; top key 1 with 3 (7500 bp)
    val li = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 13L))
      .toDF("l_orderkey", "l_partkey")
    val o = Seq((1L, 100L), (2L, 100L)).toDF("o_orderkey", "o_custkey")
    val got = Quality.joinSizeForecast(li, o)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("lineitem.orderkey x orders") === ((4L, 2L, 1L, 3L, 7500L)))
    // partkey self: all degrees 1 → Σc² = 4, top tie → smallest key 10
    assert(got("lineitem.partkey self") === ((4L, 4L, 10L, 1L, 2500L)))
    // custkey self: one key with 2 orders → 4 predicted, share 10000
    assert(got("orders.custkey self") === ((4L, 1L, 100L, 4L, 10000L)))
  }

  test("kanon generalize: finest level meeting k is chosen") {
    import spark.implicits._
    // one (nation, segment); balances 1.00 and 5.00: $1 bands split them
    // (classes of 1), $10 bands merge them (class of 2) → k=2 picks 10
    val customer = Seq(
      (1L, "S", 1.00), (1L, "S", 5.00))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Quality.kAnonGeneralize(customer, k = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (1L, 2L, 1L, false, false),
      (10L, 1L, 2L, true, true),
      (100L, 1L, 2L, true, false),
      (1000L, 1L, 2L, true, false)))
  }
}
