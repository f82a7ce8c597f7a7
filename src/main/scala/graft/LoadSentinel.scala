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
    * that point. `floors` must hold n+1 measurements for n sweeps. */
  def suspectSweeps(floors: Seq[Double], tol: Double = 0.25): Set[Int] = {
    require(floors.size >= 2, "need at least one sweep's bounding floors")
    (1 until floors.size)
      .filter(i => loadedAt(floors, i - 1, tol) || loadedAt(floors, i, tol))
      .toSet
  }
}
