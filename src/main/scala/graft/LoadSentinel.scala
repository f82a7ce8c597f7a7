package graft

/** Ambient-load sentinel for the bench harness (the round-11 lesson: a
  * contaminated sweep shipped as the round's official number — every
  * regressed query had bit-identical shuffle and untouched code, and a
  * quiet-machine re-measure returned all of them to par). The harness
  * floor — scan + one shuffle + count over the 5-row region table — is
  * a pure function of machine load: it cannot regress from a plan
  * change, so a floor that jumps between sweeps means the MACHINE got
  * slower, not the code. Bench re-measures the floor around every
  * sweep and consults this object: a sweep bounded by a loaded floor
  * measurement is re-run once; if still bounded by load, the artifact
  * is marked `"contaminated": true` so a driver or judge can never
  * mistake it for a clean number.
  *
  * Pure decision logic, no Spark — spec-gated in LoadSentinelSpec with
  * planted floor sequences.
  */
object LoadSentinel {

  /** A single floor measurement is "loaded" when it sits more than
    * `tol` ABOVE the baseline. Only upward deviation flags: a faster
    * floor means less ambient load, never contamination. */
  def loaded(floor: Double, baseline: Double, tol: Double = 0.25): Boolean =
    floor > baseline * (1.0 + tol)

  /** Baseline for measurement i = the PREFIX minimum (best floor seen
    * up to and including i): load is a floor that RISES above an
    * earlier quiet state — the r11 burst shape. A monotone-declining
    * series never flags, deliberately: a fresh JVM's JIT ramp produces
    * exactly that decline (measured: 0.23→0.14 over a short scoped
    * run), and it is indistinguishable from a run that STARTS loaded
    * and quiets down — flagging it would mark every cold-start sweep
    * contaminated and make the flag useless. (A machine loaded for the
    * entire run is likewise indistinguishable from a slow machine;
    * medians then stay internally consistent.) */
  def loadedAt(floors: Seq[Double], i: Int, tol: Double = 0.25): Boolean =
    loaded(floors(i), floors.take(i + 1).min, tol)

  /** Sweep i (1-based) is suspect when either of its bounding floor
    * measurements — floors(i-1) taken just before it, floors(i) taken
    * just after — rose more than `tol` above the best floor seen up to
    * that point. `floors` must hold n+1 measurements for n sweeps.
    *
    * This is the MID-RUN judgment (prefix-min baseline: the global
    * best isn't known yet). It has a documented blind spot — a run
    * that STARTS loaded and quiets produces a monotone-declining
    * series that never flags — and that blind spot shipped a
    * contaminated official artifact in round 12 (floors declining
    * 0.2305→0.1358 with heavy queries 6× slow). Once the run ends,
    * [[suspectSweepsFinal]] closes it. */
  def suspectSweeps(floors: Seq[Double], tol: Double = 0.25): Set[Int] = {
    require(floors.size >= 2, "need at least one sweep's bounding floors")
    (1 until floors.size)
      .filter(i => loadedAt(floors, i - 1, tol) || loadedAt(floors, i, tol))
      .toSet
  }

  /** RETROSPECTIVE judgment, run once the full floor series is known:
    * every measurement is re-judged against the GLOBAL minimum floor,
    * so a run that started loaded and quieted down (the r12 shape —
    * monotone decline, invisible to the prefix-min baseline) flags its
    * early sweeps. Exactly ONE measurement is exempt: index 0, the
    * leading floor before sweep 1 — a fresh JVM's JIT ramp makes that
    * one legitimately slow (measured: 0.23 cold vs 0.14 warm), and it
    * is the only floor where warm-up and load are indistinguishable.
    * A sweep whose TRAILING floor still sits >tol above the global
    * best ran under load, warm-up or not: by then the JIT has seen a
    * full sweep of every query. Supersedes [[suspectSweeps]] at
    * end-of-run (prefix-min ≥ global min, so every mid-run suspect is
    * also flagged here, minus none). */
  def suspectSweepsFinal(floors: Seq[Double], tol: Double = 0.25): Set[Int] = {
    require(floors.size >= 2, "need at least one sweep's bounding floors")
    val best = floors.min
    def loadedIdx(i: Int): Boolean = i != 0 && loaded(floors(i), best, tol)
    (1 until floors.size)
      .filter(i => loadedIdx(i - 1) || loadedIdx(i))
      .toSet
  }
}
