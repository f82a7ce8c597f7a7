package graft.rel

import java.sql.Timestamp

import graft.SparkSuite

/** Experimentation & monitoring ops (rel/Experiments): hand-computed
  * planted cases for the integer surfaces plus the CUPED identity
  * (perfect pre-period predictor → adjusted means equalize). */
class ExperimentsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:$s%02d")

  test("stickiness: dau/mau in bp, trailing window") {
    // u1 active day1+day2, u2 active day2 → dau 1,2; mau(1)=1, mau(2)=2
    val events = Seq(
      (1L, ts(1)), (1L, ts(2)), (2L, ts(2)), (2L, ts(2, 5)))
      .toDF("user_id", "ts")
    val got = Experiments.stickiness(events)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("2024-01-01") === ((1L, 1L, 10000L)))
    assert(got("2024-01-02") === ((2L, 2L, 10000L)))
  }

  test("stickiness: user active only long ago leaves the MAU window") {
    // u2's day-1 activity is outside the 3-day window at day 5
    val events = Seq(
      (1L, ts(1)), (2L, ts(1)), (1L, ts(5)))
      .toDF("user_id", "ts")
    val got = Experiments.stickiness(events, w = 3)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("2024-01-01") === ((2L, 2L)))
    assert(got("2024-01-05") === ((1L, 1L))) // u2 aged out
  }

  test("interarrival: gaps, telescoped mean, lower median") {
    // u1: events at 0s, 10s, 30s, 60s → gaps 10,20,30 s
    val events = Seq(
      (1L, ts(1, 0, 0), 1L), (1L, ts(1, 0, 10), 2L),
      (1L, ts(1, 0, 30), 3L), (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 4L),
      // u2: a single event → no gaps, absent from output
      (2L, ts(1), 5L))
      .toDF("user_id", "ts", "event_id")
    val got = Experiments.interarrival(events).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 3L)              // n_gaps
    assert(r.getLong(2) === 10000000L)       // min 10 s
    assert(r.getLong(3) === 30000000L)       // max 30 s
    assert(r.getLong(4) === 20000000L)       // mean = 60 s / 3
    assert(r.getLong(5) === 20000000L)       // lower median of {10,20,30}
  }

  test("interarrival: simultaneous events tie-break to a zero gap") {
    val events = Seq(
      (1L, ts(1, 0, 5), 2L), (1L, ts(1, 0, 5), 1L), (1L, ts(1, 0, 9), 3L))
      .toDF("user_id", "ts", "event_id")
    val r = Experiments.interarrival(events).collect().head
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 0L)        // the tied pair
    assert(r.getLong(3) === 4000000L)
  }

  test("cuped: perfect pre-period predictor equalizes adjusted means") {
    // Y = 2·X per user; variant 1 users have double the raw spend.
    // theta = cov/var = 2 exactly; adjusted means collapse to the
    // pooled mean of Y − 2(X − μX) = 2μX for every user → equal.
    val events = Seq(
      // pre-period (day 1-2), post-period (day 3-4); mid = day 2.5-ish
      (0L, ts(1), 10.0), (0L, ts(4), 20.0),
      (2L, ts(1), 30.0), (2L, ts(4), 60.0),
      (1L, ts(1), 20.0), (1L, ts(4), 40.0),
      (3L, ts(1), 40.0), (3L, ts(4), 80.0))
      .toDF("user_id", "ts", "value")
    val got = Experiments.cuped(events).collect()
    assert(got.length === 2)
    val v0 = got(0); val v1 = got(1)
    assert(v0.getInt(0) === 0 && v1.getInt(0) === 1)
    assert(math.abs(v0.getDouble(4) - 2.0) < 1e-12)   // theta
    assert(v0.getDouble(5) !== v1.getDouble(5))       // raw means differ
    assert(math.abs(v0.getDouble(6) - v1.getDouble(6)) < 1e-9) // adjusted equal
  }

  test("volume anomaly: constant history then a spike flags; warm-up null") {
    val rows = (1 to 8).map(d => ts(d)) ++ // 100/day baseline ×8 days
      Seq.fill(99)((1 to 8).map(d => ts(d))).flatten ++
      Seq.fill(500)(Seq(ts(9))).flatten    // day 9 spikes to 500
    val events = rows.toDF("ts")
    val got = Experiments.volumeAnomaly(events)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4)))
      .toMap
    // warm-up: day 3 has only 2 predecessors → z2 null, no flag
    assert(got("2024-01-03")._3.isEmpty && !got("2024-01-03")._4)
    // day 9: 7 constant predecessors → var 0 → z2 null (degenerate)…
    assert(got("2024-01-09")._1 === 500L)
    // …so plant variance: re-run with one wiggle day
    val rows2 = rows ++ Seq(ts(2)) // day 2 = 101
    val got2 = Experiments.volumeAnomaly(rows2.toDF("ts"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4))).toMap
    // day 9 window: counts {100,101,100,100,100,100,100}: s=701, s2=70201
    // n·c−s = 7·500−701 = 2799; n·s2−s² = 491407−491401 = 6
    // z2_milli = 2799²·1000 div 6 = 1305733500
    assert(got2("2024-01-09")._2 === Some(1305733500L))
    assert(got2("2024-01-09")._3)
    assert(!got2("2024-01-08")._3)
  }

  test("neyman: zero-variance stratum gets zero allocation; known case") {
    // A: balances 1.00, 3.00 → var = (2·(10000+90000) − 160000)/2
    //    = 20000 cents², sd = isqrt(20000) = 141
    // B: two equal balances → sd 0 → weight 0, alloc 0
    val customer = Seq(
      ("A", 1.00), ("A", 3.00), ("B", 5.00), ("B", 5.00))
      .toDF("c_mktsegment", "c_acctbal")
    val got = Experiments.neymanAllocation(customer, budget = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("A") === ((2L, 141L, 282L, 100L, 10000L)))
    assert(got("B") === ((2L, 0L, 0L, 0L, 0L)))
  }

  test("experiments queries: invariant to input partitioning") {
    val ev = graft.core.Tables.events(spark, sfDir)
    for (q <- Seq("events_stickiness", "events_interarrival",
        "events_cuped", "dq_volume_anomaly")) {
      val f = graft.SparkEntry.queries(q)
      val a = f(spark, sfDir).collect().toSeq
      assert(a.nonEmpty, q)
    }
    val a = Experiments.interarrival(ev).collect().toSeq
    val b = Experiments.interarrival(ev.repartition(13)).collect().toSeq
    assert(a === b)
  }

  test("heatmap: integer weekday from epoch day, exact shares") {
    // 2024-01-01 is a Monday → weekday 0; 2024-01-02 → 1
    val events = Seq(
      (1L, ts(1, 5)), (2L, ts(1, 5)), (3L, Timestamp.valueOf("2024-01-02 23:00:00")))
      .toDF("user_id", "ts")
    val got = Experiments.hourOfWeekHeatmap(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq((0L, 5L, 2L, 6666L), (1L, 23L, 1L, 3333L)))
  }

  test("wilson CTR: 9/10 outranks 1/1 — the lower-bound ranking rule") {
    // bucket 1: users 1,11,...,91 (n=10), 9 convert; bucket 2: user 2
    // alone converts (n=1, c=1, raw CTR 1000)
    val rows =
      (0 until 10).map(i => (1L + 10 * i, "purchase",
        if (i < 9) 250.0 else 10.0)) :+ ((2L, "purchase", 250.0))
    val events = rows.map { case (u, t, v) => (u, ts(1), t, v) }
      .toDF("user_id", "ts", "event_type", "value")
    val got = Experiments.wilsonCtr(events).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // hand: wilson(9/10) = (11000 − 2·isqrt(1.9e6)) div 14 = 588
    //       wilson(1/1)  = (3000 − 2·isqrt(1e6))  div 5  = 200
    assert(got.toSeq === Seq(
      (1, 10L, 9L, 900L, 588L),
      (2, 1L, 1L, 1000L, 200L)))
  }

  test("busdays kernel: weekday spans, weekend skips, invalid rows flagged") {
    import spark.implicits._
    val orders = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),  // Monday
      (2L, Timestamp.valueOf("2024-01-05 00:00:00")),  // Friday
      (3L, Timestamp.valueOf("2024-02-01 00:00:00")))  // ships BEFORE order
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, Timestamp.valueOf("2024-01-05 00:00:00")),  // Mon→Fri: 4 busdays
      (2L, Timestamp.valueOf("2024-01-08 00:00:00")),  // Fri→Mon: 1 busday
      (3L, Timestamp.valueOf("2024-01-02 00:00:00")))  // negative span
      .toDF("l_orderkey", "l_shipdate")
    val got = graft.rel.Scalars.businessDaySla(orders, li).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4),
        Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      (1L, 4L, true, Some(4L)),
      (2L, 3L, true, Some(1L)),
      (3L, -30L, false, None)))
  }

  test("DiD: hand 2x2 table and exact milli-cent estimate") {
    // same plant as the CUPED identity: Y = 2X, variant 1 doubles spend
    val events = Seq(
      (0L, ts(1), 10.0), (0L, ts(4), 20.0),
      (2L, ts(1), 30.0), (2L, ts(4), 60.0),
      (1L, ts(1), 20.0), (1L, ts(4), 40.0),
      (3L, ts(1), 40.0), (3L, ts(4), 80.0))
      .toDF("user_id", "ts", "value")
    val r = Experiments.diffInDiff(events).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((2L, 4000L, 8000L, 2L, 6000L, 12000L)))
    // ((12000−6000)·2 − (8000−4000)·2)·1000 div 4 = 1,000,000
    assert(r.getLong(6) === 1000000L)
  }

  test("markov steady state: symmetric 2-cycle stays uniform; " +
      "absorbing state takes all mass") {
    // u1 alternates A,B,A,B → A→B ×2? path A B A B: A→B 2, B→A 1
    // make it symmetric instead: two users with opposite phases
    val sym = Seq(
      (1L, ts(1, 1), 1L, "A"), (1L, ts(1, 2), 2L, "B"),
      (1L, ts(1, 3), 3L, "A"), (1L, ts(1, 4), 4L, "B"),
      (2L, ts(1, 1), 5L, "B"), (2L, ts(1, 2), 6L, "A"),
      (2L, ts(1, 3), 7L, "B"), (2L, ts(1, 4), 8L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val g1 = Experiments.markovSteadyState(sym)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g1 === Map("A" -> 500000000000L, "B" -> 500000000000L))
    // absorbing: every transition lands in B, B never leaves
    val abs = Seq(
      (1L, ts(1, 1), 1L, "A"), (1L, ts(1, 2), 2L, "B"),
      (2L, ts(1, 1), 3L, "A"), (2L, ts(1, 2), 4L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val g2 = Experiments.markovSteadyState(abs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2 === Map("A" -> 0L, "B" -> 1000000000000L))
  }

  test("cumulative users: first-day counting, running total exact") {
    val events = Seq(
      (1L, ts(1)), (2L, ts(1)),          // day 1: both new
      (1L, ts(2)),                        // day 2: dau 1, no new
      (3L, ts(3)), (1L, ts(3)))           // day 3: u3 new
      .toDF("user_id", "ts")
    val got = Experiments.cumulativeUsers(events)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 2L, 2L),
      ("2024-01-02", 1L, 0L, 2L),
      ("2024-01-03", 2L, 1L, 3L)))
  }

  test("power check: identical arms give NULL; planted effect sizes n") {
    // arms 10 vs 10 users, 5 vs 5 conversions → delta 0 → NULL
    val same = (0 until 20).map { i =>
      (i.toLong, ts(1), "purchase", if (i < 10) 250.0 else 10.0)
    }.toDF("user_id", "ts", "event_type", "value")
    val r0 = Experiments.powerCheck(same).collect().head
    assert(r0.isNullAt(6) && r0.isNullAt(7))
    // 2 users/arm, conversions 1 vs 2: pbar=3/4, delta=1/2
    // required = ceil(2·784·3·1·16 / (100·16·4)) = ceil(75264/6400) = 12
    val eff = Seq(
      (0L, 250.0), (2L, 10.0),   // variant 0: 1 of 2 converts
      (1L, 250.0), (3L, 250.0))  // variant 1: both convert
      .map { case (u, v) => (u, ts(1), "purchase", v) }
      .toDF("user_id", "ts", "event_type", "value")
    val r1 = Experiments.powerCheck(eff).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
      === ((2L, 1L, 2L, 2L)))
    assert(r1.getLong(4) === 750L)      // pbar_milli
    assert(r1.getLong(5) === 500000L)   // delta_micro
    assert(r1.getLong(6) === 12L)       // required per arm
    assert(!r1.getBoolean(7))           // 2 < 12 → underpowered
  }

  test("bot flags: fast+dense fires, fast-only and dense-only do not") {
    // u1: 10 events 100 ms apart on one day → sub-second gaps, 10000 milli/day
    val fast = (0 until 10).map(i =>
      (1L, Timestamp.valueOf(f"2024-01-01 10:00:00.${i}00"), i.toLong))
    // u2: 10 events, one per day → dense? 1000 milli/day, gaps huge
    val slow = (0 until 10).map(i =>
      (2L, ts(i + 1), 100L + i))
    // u3: two events a millisecond apart but only 2 total (sparse)
    val brief = Seq(
      (3L, Timestamp.valueOf("2024-01-01 10:00:00.000"), 200L),
      (3L, Timestamp.valueOf("2024-01-01 10:00:00.001"), 201L))
    val events = (fast ++ slow ++ brief)
      .toDF("user_id", "ts", "event_id")
    val got = Experiments.botFlags(events)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("next-type baseline: argmax successor, lexical-max tie, floor bp") {
    val events = Seq(
      // u1: A→B, B→A, A→B ; u2: A→C
      (1L, ts(1, 1), 1L, "A"), (1L, ts(1, 2), 2L, "B"),
      (1L, ts(1, 3), 3L, "A"), (1L, ts(1, 4), 4L, "B"),
      (2L, ts(1, 1), 5L, "A"), (2L, ts(1, 2), 6L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Experiments.nextTypeBaseline(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // A: B×2, C×1 → predict B, 2/3 → 6666 bp; B: A×1 → 10000 bp
    assert(got.toSeq === Seq(
      ("A", 3L, "B", 2L, 6666L),
      ("B", 1L, "A", 1L, 10000L)))
  }

  test("session coverage: gaps split sessions, point sessions are zero") {
    val events = Seq(
      // u1: session A 10:00-10:10, then 40-min gap, session B 10:50 (point)
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (1L, Timestamp.valueOf("2024-01-01 10:10:00"), 2L),
      (1L, Timestamp.valueOf("2024-01-01 10:50:00"), 3L),
      // u2: single event → span 0 → coverage NULL
      (2L, Timestamp.valueOf("2024-01-01 09:00:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val got = Experiments.sessionCoverage(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    // u1: in-session 600s, span 3000s → 2000 bp
    assert(got(1L) === ((2L, 600000000L, 3000000000L, Some(2000L))))
    assert(got(2L) === ((1L, 0L, 0L, None)))
  }

  test("activation: all-steps rate vs per-step penetration") {
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(1, 1), "click"), (1L, ts(1, 2), "purchase"),
      (2L, ts(1), "view"), (2L, ts(1, 1), "click"),
      (3L, ts(1), "view"),
      (4L, ts(1), "error"))  // counted in n_users, no core steps
      .toDF("user_id", "ts", "event_type")
    val got = Experiments.activation(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("click", 2L, 4L, 5000L, 1L, 2500L),
      ("purchase", 1L, 4L, 2500L, 1L, 2500L),
      ("view", 3L, 4L, 7500L, 1L, 2500L)))
  }
}
