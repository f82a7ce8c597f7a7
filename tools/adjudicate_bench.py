#!/usr/bin/env python3
"""Adjudicate a candidate BENCH_LOCAL.json against the last committed
CLEAN map — the uniform-load detector the r13 builder ran by hand.

The in-run LoadSentinel catches load BURSTS (floor spikes mid-run) and,
since r13, retrospective floor decline; but a machine that is UNIFORMLY
loaded for the whole run produces internally-consistent floors and a
map that is simply ~15-25% slow everywhere — invisible to any
floor-based judgment (r13: a 335.9 s run read "clean" while the quiet
machine gives 289.3 s; median per-query ratio 1.19). The only signal is
the comparison this tool automates: against the last committed clean
map, restricted to queries whose SHUFFLE BYTES ARE IDENTICAL (same
plan, so any wall ratio is environment, not code) and whose wall_class
is "steady" (decode-bound / iterative-fixpoint / serving walls are
environment-bistable by their nature — r13 VERDICT "What's wrong" —
and only add noise to the load estimate).

Judgment: median(candidate_wall / baseline_wall) over the comparison
set. > threshold (default 1.10) => exit 1, "uniformly loaded — re-run
on a quiet machine". A candidate self-reporting contaminated=true is
refused outright. NOTE the deliberate asymmetry: a uniformly FAST run
(ratio < 1) is never refused — faster-than-baseline is what code
improvements look like, and the per-query shuffle map still gates
plan-level claims.

Baseline resolution: --baseline FILE, else walk `git log` for
BENCH_LOCAL.json and take the newest committed version that
self-reports contaminated=false and covers >= --min-n queries (the
r13 driver commit holds a contaminated map ABOVE the clean one, so
"HEAD's copy" is not good enough).

Probe mode (--probe): any comparable query (steady OR iterative,
shuffle-identical) whose wall ratio exceeds --probe-threshold is
auto-adjudicated with graft.ScopedProbe — N back-to-back executions in
one JVM — and the cold/steady/GC curve lands in --probe-out as a typed
verdict ("environment_or_jit" when steady state is within 10% of the
baseline wall, "code_regression" otherwise). This is the r14
pagerank/pagerank_weighted hand-run adjudication as a tool output.

Usage:
  adjudicate_bench.py CANDIDATE [--baseline FILE] [--threshold 1.10]
                      [--min-n 20] [--min-wall 0.3]
                      [--probe] [--probe-n 6] [--probe-threshold 1.25]
                      [--probe-out FILE] [--probe-cmd TEMPLATE]

Exit: 0 accept, 1 refuse, 2 usage/environment error.
"""
import argparse
import json
import re
import statistics
import subprocess
import sys

# Queries slower than this in the BASELINE enter the ratio; below it,
# the harness floor (~0.15-0.2 s) dominates and ratios are noise.
DEFAULT_MIN_WALL = 0.3
# Shuffle "identical": abs diff <= 0.05 MB or rel diff <= 2% (the maps
# record MB at 2 decimals; bit-identical plans agree to the digit, the
# tolerance only absorbs rounding and AQE wobble on tiny exchanges).
SHUFFLE_ABS_MB = 0.05
SHUFFLE_REL = 0.02

# Uniform-drift classification (the r15 close's hand adjudication —
# "median ratio 1.088 over 208 steady shuffle-identical queries, floors
# 0.110-0.117 vs 0.098-0.107, zero spill => machine drift" — as tool
# thresholds instead of BENCH_NOTES prose, pinned by
# AdjudicateBenchSpec):
#   clean            median ratio <= DRIFT_CLEAN_MED
#   uniform_drift    ratio above clean but within the refuse threshold,
#                    AND the harness floor moved at least
#                    DRIFT_FLOOR_SHARE of the drift (machine-wide
#                    slowdowns hit the floor probe too), AND spill did
#                    not grow past DRIFT_SPILL_TOL_MB (spill growth is a
#                    code/memory signature, never ambient load)
#   unexplained_drift  same ratio band but floor/spill do NOT corroborate
#                    a machine-wide cause — accepted (exit 0) but the
#                    verdict demands a manual look before the map stands
#   uniformly_loaded median ratio past the refuse threshold (exit 1)
DRIFT_CLEAN_MED = 1.03
DRIFT_FLOOR_SHARE = 0.5
DRIFT_SPILL_TOL_MB = 1.0

# Known BROADCAST-THRESHOLD bistability: queries whose label/edge side
# sits near spark.sql.autoBroadcastJoinThreshold at the bench SF, so
# AQE legitimately flips some supersteps between broadcast (lower
# shuffle) and exchange (higher) across environments with bit-identical
# code. Values are the two observed stable states in MB; a candidate/
# baseline pair where EACH side matches ONE of the listed states is
# treated as plan-identical (the r14 verdict item #7 exemption, encoded
# as tool data instead of prose). At 100 TB the exchange state is the
# only one — the transition itself is the documented design.
KNOWN_BISTABLE_SHUFFLE_MB = {
    "graph_scc": (8.58, 10.26),
}


def load(path):
    with open(path) as f:
        return json.load(f)


def committed_clean_baseline(min_n):
    """Newest committed BENCH_LOCAL.json with contaminated=false."""
    try:
        hashes = subprocess.run(
            ["git", "log", "--format=%H", "--", "BENCH_LOCAL.json"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
    except subprocess.CalledProcessError as e:
        print(f"[adjudicate] ERROR: git log failed: {e.stderr.strip()}",
              file=sys.stderr)
        return None, None
    for h in hashes:
        shown = subprocess.run(
            ["git", "show", f"{h}:BENCH_LOCAL.json"],
            capture_output=True, text=True)
        if shown.returncode != 0:
            continue
        try:
            m = json.loads(shown.stdout)
        except json.JSONDecodeError:
            continue
        if m.get("contaminated") is False and len(m.get("queries", {})) >= min_n:
            return m, h[:8]
    return None, None


def shuffle_identical(a, b):
    if a is None or b is None:
        return False
    return abs(a - b) <= SHUFFLE_ABS_MB or (
        max(a, b) > 0 and abs(a - b) / max(a, b) <= SHUFFLE_REL)


def shuffle_identical_q(q, a, b):
    """shuffle_identical, plus the known broadcast-threshold bistable
    states: both sides matching (possibly different) listed states for
    q is the SAME plan caught on different sides of the threshold."""
    if shuffle_identical(a, b):
        return True
    states = KNOWN_BISTABLE_SHUFFLE_MB.get(q)
    if states is None or a is None or b is None:
        return False
    def matches_some(x):
        return any(shuffle_identical(x, s) for s in states)
    if matches_some(a) and matches_some(b):
        print(f"[adjudicate] INFO: {q} shuffle {a} vs {b} MB matches the "
              f"known broadcast-threshold bistable states {states} — "
              f"treated as plan-identical")
        return True
    return False


def drift_verdict(med, n, cand, base, threshold):
    """Single typed uniform-drift verdict (see constants above)."""
    fr = None
    cf, bf = cand.get("floor_sec"), base.get("floor_sec")
    # explicit None check: a 0.0 candidate floor is real data, not
    # missing — truthiness would misclassify it as unexplained_drift
    if cf is not None and bf:
        fr = cf / bf
    cs, bs = cand.get("spill_mb_total"), base.get("spill_mb_total")
    spill_ok = cs is None or bs is None or cs <= bs + DRIFT_SPILL_TOL_MB
    if med > threshold:
        v = "uniformly_loaded"
    elif med <= DRIFT_CLEAN_MED:
        v = "clean"
    elif (fr is not None and fr >= 1 + (med - 1) * DRIFT_FLOOR_SHARE
          and spill_ok):
        v = "uniform_drift"
    else:
        v = "unexplained_drift"
    return {
        "verdict": v,
        "median_wall_ratio": round(med, 4),
        "n_compared": n,
        "floor_ratio": round(fr, 4) if fr is not None else None,
        "spill_mb": {"candidate": cs, "baseline": bs},
        "thresholds": {"refuse": threshold, "clean": DRIFT_CLEAN_MED,
                       "floor_share": DRIFT_FLOOR_SHARE,
                       "spill_tol_mb": DRIFT_SPILL_TOL_MB},
    }


PROBE_RUN_RE = re.compile(
    r"run\s+(\d+):\s+([0-9.]+)\s+s\s+gc=\s*(\d+)\s+ms")
PROBE_FLOOR_RE = re.compile(r"probe floor:\s+([0-9.]+)\s+s")


def run_probe(q, args, sf_dir):
    """Run graft.ScopedProbe for q and parse per-execution walls/GC."""
    if args.probe_cmd:
        cmd = ["bash", "-c", args.probe_cmd.format(
            query=q, n=args.probe_n, sf=sf_dir)]
    else:
        import glob
        cp = "target/scala-2.13/classes:" + ":".join(
            sorted(glob.glob("/opt/spark/jars/*.jar")))
        cmd = ["java", "-Xmx24g",
               "--add-exports", "java.base/sun.nio.ch=ALL-UNNAMED",
               "--add-opens", "java.base/java.nio=ALL-UNNAMED",
               "--add-opens", "java.base/java.util=ALL-UNNAMED",
               "--add-opens", "java.base/java.lang=ALL-UNNAMED",
               "--add-opens", "java.base/java.lang.invoke=ALL-UNNAMED",
               "--add-opens", "java.base/jdk.internal.misc=ALL-UNNAMED",
               "--add-opens", "java.base/sun.security.action=ALL-UNNAMED",
               "-cp", cp, "graft.ScopedProbe", q, str(args.probe_n), sf_dir]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    runs = [(float(w), int(g))
            for _, w, g in PROBE_RUN_RE.findall(proc.stdout)]
    if not runs:
        return {"query": q, "error": "probe produced no run lines",
                "rc": proc.returncode,
                "stderr_tail": proc.stderr.strip().splitlines()[-3:]}
    walls = [w for w, _ in runs]
    steady = min(walls[-min(3, len(walls)):])
    out = {"query": q, "walls": walls, "gc_ms": [g for _, g in runs],
           "cold": walls[0], "steady": steady,
           "gc_max_ms": max(g for _, g in runs)}
    floor = PROBE_FLOOR_RE.search(proc.stdout)
    if floor:
        out["probe_floor"] = float(floor.group(1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate")
    ap.add_argument("--baseline")
    ap.add_argument("--threshold", type=float, default=1.10)
    ap.add_argument("--min-n", type=int, default=20,
                    help="minimum comparison-set size to judge on")
    ap.add_argument("--min-wall", type=float, default=DEFAULT_MIN_WALL)
    ap.add_argument("--probe", action="store_true",
                    help="ScopedProbe-adjudicate flagged wall increases")
    ap.add_argument("--probe-n", type=int, default=6)
    ap.add_argument("--probe-threshold", type=float, default=1.25)
    ap.add_argument("--probe-out", default="PROBE_ADJUDICATION.json")
    ap.add_argument("--probe-cmd", default=None,
                    help="override probe command template "
                         "({query} {n} {sf} placeholders; tests inject "
                         "a fake probe here)")
    ap.add_argument("--drift-out", default="DRIFT_VERDICT.json",
                    help="file for the typed uniform-drift verdict")
    args = ap.parse_args()

    cand = load(args.candidate)
    if cand.get("contaminated") is True:
        print("[adjudicate] REFUSE: candidate self-reports "
              "contaminated=true (LoadSentinel) — re-run on a quiet "
              "machine", file=sys.stderr)
        return 1

    if args.baseline:
        base, base_ref = load(args.baseline), args.baseline
    else:
        base, base_ref = committed_clean_baseline(args.min_n)
        if base is None:
            print("[adjudicate] WARN: no committed clean BENCH_LOCAL.json "
                  "found in git history — nothing to adjudicate against; "
                  "accepting on the in-run sentinel alone")
            return 0

    cq, bq = cand.get("queries", {}), base.get("queries", {})
    csh = cand.get("shuffle_write_mb", {})
    bsh = base.get("shuffle_write_mb", {})
    # wall_class ships in the candidate (Bench emits it); fall back to
    # the baseline's, then to steady-for-everyone for old maps.
    wc = cand.get("wall_class") or base.get("wall_class") or {}

    ratios = []
    for q in sorted(set(cq) & set(bq)):
        if wc.get(q, "steady") != "steady":
            continue
        if bq[q] < args.min_wall:
            continue
        if not shuffle_identical_q(q, csh.get(q), bsh.get(q)):
            continue  # plan changed: wall delta is code, not load
        ratios.append((cq[q] / bq[q], q))

    if args.probe:
        # flagged = steady/iterative, plan-identical, wall up past the
        # probe threshold: exactly the unchanged-plan increases r13/r14
        # closed with hand-run probes (pagerank 3.31->4.29 s etc.)
        flagged = [
            q for q in sorted(set(cq) & set(bq))
            if wc.get(q, "steady") in ("steady", "iterative")
            and bq[q] >= args.min_wall
            and shuffle_identical_q(q, csh.get(q), bsh.get(q))
            and cq[q] / bq[q] > args.probe_threshold]
        sf_dir = cand.get("sf") or base.get("sf") or "/root/testdata/sf0.1"

        def judge(r, q):
            """Attach the typed verdict to a parsed probe curve."""
            if "steady" not in r:
                return r
            # Judge WORK against work when both floors are known:
            # wall = harness floor + work, and the floor is a pure
            # machine-load term that drifts between rounds (r16:
            # 0.115 -> 0.149 s between consecutive clean maps, which
            # alone pushed a flat 0.45 s query past a 10% wall
            # threshold and minted the tool's only false
            # code_regression). The probe publishes its own floor
            # (same JVM, right after the runs); the baseline map
            # self-measured its floor at sweep time.
            pf, blf = r.get("probe_floor"), base.get("floor_sec")
            if pf is not None and blf is not None:
                work = max(r["steady"] - pf, 0.0)
                base_work = max(bq[q] - blf, 1e-6)
                r["steady_work"] = round(work, 4)
                r["baseline_work"] = round(base_work, 4)
                r["verdict"] = ("environment_or_jit"
                                if work <= base_work * 1.10
                                else "code_regression")
            else:
                # floor-less probe output (old build): raw wall rule
                r["verdict"] = ("environment_or_jit"
                                if r["steady"] <= bq[q] * 1.10
                                else "code_regression")
            return r

        results = []
        for q in flagged:
            r = judge(run_probe(q, args, sf_dir), q)
            # A code_regression verdict earns ONE retry in a fresh
            # window: steady wall is a MIN-statistic, so ambient load
            # can only inflate it — a second curve at-or-below the
            # first is strictly better evidence, and a regression that
            # is real will read slow in both windows. (Observed: a
            # probe window with 781 ms GC and the run's highest floor
            # minted a 3.04 s "regression" on a query that probes at
            # 1.59-1.66 s steady in any quiet window.)
            if r.get("verdict") == "code_regression":
                r2 = judge(run_probe(q, args, sf_dir), q)
                if "steady" in r2 and r2["steady"] < r["steady"]:
                    r2["first_attempt_steady"] = r["steady"]
                    r2["retried"] = True
                    r = r2
                else:
                    r["retried"] = True
            r["baseline_wall"] = bq[q]
            r["candidate_wall"] = cq[q]
            r["ratio"] = round(cq[q] / bq[q], 3)
            if "steady" in r:
                print(f"[adjudicate] PROBE {q}: cold={r['cold']:.3f}s "
                      f"steady={r['steady']:.3f}s (baseline {bq[q]:.3f}s, "
                      f"sweep {cq[q]:.3f}s) gc_max={r['gc_max_ms']}ms "
                      f"floor={r.get('probe_floor')}"
                      f"{' retried' if r.get('retried') else ''} -> "
                      f"{r['verdict']}")
            else:
                print(f"[adjudicate] PROBE {q}: FAILED ({r.get('error')})",
                      file=sys.stderr)
            results.append(r)
        with open(args.probe_out, "w") as f:
            json.dump({"probe_n": args.probe_n,
                       "probe_threshold": args.probe_threshold,
                       "sf": sf_dir, "flagged": results}, f, indent=1)
        print(f"[adjudicate] probe artifact: {args.probe_out} "
              f"({len(results)} flagged quer"
              f"{'y' if len(results) == 1 else 'ies'})")

    if len(ratios) < args.min_n:
        print(f"[adjudicate] WARN: only {len(ratios)} comparable "
              f"steady/shuffle-identical queries vs baseline {base_ref} "
              f"(need {args.min_n}) — too few to judge load; accepting "
              f"on the in-run sentinel alone")
        return 0

    med = statistics.median(r for r, _ in ratios)
    verdict = drift_verdict(med, len(ratios), cand, base, args.threshold)
    with open(args.drift_out, "w") as f:
        json.dump(verdict, f, indent=1)
    print(f"[adjudicate] uniform-drift verdict: {json.dumps(verdict)}")
    worst = sorted(ratios, reverse=True)[:5]
    detail = ", ".join(f"{q} {r:.2f}x" for r, q in worst)
    if verdict["verdict"] == "uniformly_loaded":
        print(f"[adjudicate] REFUSE: median wall ratio {med:.3f} over "
              f"{len(ratios)} steady shuffle-identical queries vs "
              f"baseline {base_ref} (> {args.threshold:.2f}) — the "
              f"machine was uniformly loaded for the whole run (the "
              f"r13 335.9s-vs-289.3s failure shape). Re-run the full "
              f"bench on a quiet machine. Worst: {detail}",
              file=sys.stderr)
        return 1
    if verdict["verdict"] == "unexplained_drift":
        print(f"[adjudicate] WARN: median wall ratio {med:.3f} is in the "
              f"drift band but the floor/spill evidence does NOT "
              f"corroborate a machine-wide cause (floor_ratio="
              f"{verdict['floor_ratio']}) — accepted, but look before "
              f"the map stands. Worst: {detail}")
        return 0
    print(f"[adjudicate] OK ({verdict['verdict']}): median wall ratio "
          f"{med:.3f} over {len(ratios)} steady shuffle-identical "
          f"queries vs baseline {base_ref} "
          f"(threshold {args.threshold:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
