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

  /** Baseline = the minimum floor observed across the run: the floor is
    * a fixed cost, so the smallest observation is the closest to the
    * true quiet-machine value. (A machine loaded for the ENTIRE run is
    * indistinguishable from a slow machine — every measurement becomes
    * the baseline and nothing flags; the per-query medians are then at
    * least internally consistent.) */
  def baseline(floors: Seq[Double]): Double = floors.min

  /** Sweep i (1-based) is suspect when either of its bounding floor
    * measurements — floors(i-1) taken just before it, floors(i) taken
    * just after — is loaded relative to the run baseline. `floors` must
    * hold n+1 measurements for n sweeps. */
  def suspectSweeps(floors: Seq[Double], tol: Double = 0.25): Set[Int] = {
    require(floors.size >= 2, "need at least one sweep's bounding floors")
    val base = baseline(floors)
    (1 until floors.size)
      .filter(i => loaded(floors(i - 1), base, tol) ||
        loaded(floors(i), base, tol))
      .toSet
  }
}
