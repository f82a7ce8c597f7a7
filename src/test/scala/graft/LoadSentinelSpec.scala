package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's ambient-load sentinel (LoadSentinel.scala) on planted
  * floor sequences — the round-11 prescription: a sweep bounded by a
  * floor >25% above the run's best must flag, and a quiet run must
  * never flag. No Spark needed: the logic is pure. */
class LoadSentinelSpec extends AnyFunSuite {

  test("quiet run: small jitter never flags") {
    // 3 sweeps, floors within ±8% of 0.13 — all intervals clean
    assert(LoadSentinel.suspectSweeps(
      Seq(0.13, 0.14, 0.13, 0.135)) === Set.empty[Int])
  }

  test("planted slow floor mid-run flags exactly its bounding sweeps") {
    // the r11 shape: load burst during sweep 2's closing floor —
    // sweeps 2 and 3 are both bounded by the 0.20 measurement
    assert(LoadSentinel.suspectSweeps(
      Seq(0.13, 0.13, 0.20, 0.13)) === Set(2, 3))
  }

  test("monotone warm-up decline never flags (JIT ramp ≠ load)") {
    // the prefix-min baseline: a fresh JVM's floor declines for tens of
    // seconds as C2 compiles the scheduler paths — indistinguishable
    // from a run that starts loaded and quiets, and flagging it would
    // mark every cold-start sweep contaminated
    assert(LoadSentinel.suspectSweeps(
      Seq(0.23, 0.20, 0.18, 0.14, 0.14)) === Set.empty[Int])
  }

  test("burst AFTER a quiet prefix flags even if later floors are lower") {
    // rise above the earlier quiet state is the signal; the prefix min
    // at the burst point is 0.13, so 0.20 flags its bounding sweeps
    assert(LoadSentinel.suspectSweeps(
      Seq(0.14, 0.13, 0.20, 0.12)) === Set(2, 3))
  }

  test("boundary: exactly +25% does not flag, just above does") {
    assert(!LoadSentinel.loaded(0.125, 0.1, 0.25))
    assert(LoadSentinel.loaded(0.1251, 0.1, 0.25))
    assert(LoadSentinel.suspectSweeps(Seq(0.1, 0.125)) === Set.empty[Int])
    assert(LoadSentinel.suspectSweeps(Seq(0.1, 0.126)) === Set(1))
  }

  test("downward deviation never flags (a faster floor is less load)") {
    assert(LoadSentinel.suspectSweeps(
      Seq(0.13, 0.11, 0.13, 0.13)) === Set.empty[Int])
  }

  test("uniformly loaded run is indistinguishable and stays unflagged") {
    // documented limitation: if every measurement is equally slow the
    // baseline IS the loaded floor — medians are internally consistent
    assert(LoadSentinel.suspectSweeps(
      Seq(0.20, 0.20, 0.20)) === Set.empty[Int])
  }

  // ---- retrospective (end-of-run, global-min baseline) judgment ----

  test("r12 regression: the exact contaminated-run floor series flags " +
    "sweep 1 retrospectively") {
    // the round-12 official artifact's floors, verbatim: monotone
    // decline, so the prefix-min mid-run pass waved it through — while
    // the judge's quiet re-measure proved heavy queries ran 6× slow
    // under the 0.2305/0.1732 floors. Retrospectively, vs the global
    // best 0.1358 (+25% gate = 0.16975): idx 0 is exempt (leading,
    // JIT), idx 1 = 0.1732 is loaded → sweeps 1 and 2 are suspect.
    val r12 = Seq(0.2305, 0.1732, 0.1548, 0.1504, 0.1358)
    assert(LoadSentinel.suspectSweeps(r12) === Set.empty[Int],
      "mid-run pass is blind to the decline shape, by design")
    val sus = LoadSentinel.suspectSweepsFinal(r12)
    assert(sus.contains(1), "sweep 1 ran under the 0.1732 trailing floor")
    assert(sus === Set(1, 2))
  }

  test("retrospective pass exempts only the leading floor: a true " +
    "JIT warm-up run (slow idx 0, quiet after) stays clean") {
    assert(LoadSentinel.suspectSweepsFinal(
      Seq(0.23, 0.14, 0.138, 0.141, 0.139)) === Set.empty[Int])
  }

  test("retrospective pass subsumes every mid-run suspect (prefix min " +
    "≥ global min)") {
    for (s <- Seq(Seq(0.13, 0.13, 0.20, 0.13), Seq(0.14, 0.13, 0.20, 0.12),
        Seq(0.1, 0.126), Seq(0.13, 0.14, 0.13, 0.135))) {
      assert(LoadSentinel.suspectSweeps(s)
        .subsetOf(LoadSentinel.suspectSweepsFinal(s)))
    }
  }

  test("retrospective boundary: trailing floor exactly +25% of global " +
    "best does not flag, just above does") {
    assert(LoadSentinel.suspectSweepsFinal(
      Seq(0.2, 0.125, 0.1)) === Set.empty[Int])
    assert(LoadSentinel.suspectSweepsFinal(
      Seq(0.2, 0.126, 0.1)) === Set(1, 2))
  }
}
