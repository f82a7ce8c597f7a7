#!/usr/bin/env python3
"""Refuse subset-run BENCH_LOCAL.json files (the r10/r12 trap).

A scoped `SPARK_GRAFT_ONLY=...` bench run overwrites BENCH_LOCAL.json
with a map covering only the scoped queries. Twice now (r10's warning
notwithstanding, again at the r12 snapshot) such a subset map has been
committed as the round's record, destroying the full per-query
round-over-round shuffle/wall adjudication signal. This check compares
BENCH_LOCAL.json's per-query map against the ORACLE-DECLARED query set
(read from the Verify dump's oracle_sql.json — the registry's keys
minus any oracle-ineligible rows-only queries; today the two sets are
identical, 367 = 367) and exits non-zero when any oracle-declared
query is missing from the bench map. A subset sweep covers a handful
of queries, so it fails immediately; a map that covered every
oracle-declared query while omitting a future rows-only query would
slip through — if rows-only queries are ever declared, extend this to
read the registry size directly.

Usage: check_bench_local.py <oracle_sql.json> [BENCH_LOCAL.json]
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[-1], file=sys.stderr)
        return 2
    oracle_path = sys.argv[1]
    bench_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_LOCAL.json"
    with open(oracle_path) as f:
        declared = set(json.load(f).keys())
    try:
        with open(bench_path) as f:
            bench = json.load(f)
    except FileNotFoundError:
        print(f"[bench-local] FAIL: {bench_path} missing — run the FULL "
              f"bench before closing the round", file=sys.stderr)
        return 1
    benched = set(bench.get("queries", {}).keys())
    # the registry can legitimately exceed the oracle map (oracle-
    # ineligible ops get rows-only checks and no oracle_sql entry), so
    # the gate is: every ORACLE-DECLARED query must appear in the bench
    # map. A subset sweep fails this immediately (it covers a handful).
    missing = sorted(declared - benched)
    if missing:
        print(f"[bench-local] FAIL: {bench_path} covers {len(benched)} "
              f"queries but the registry declares {len(declared)}; "
              f"missing e.g. {missing[:8]} — this is a subset-sweep "
              f"artifact. Re-run the FULL bench (no SPARK_GRAFT_ONLY) "
              f"before committing.", file=sys.stderr)
        return 1
    # provenance: the committed canonical map must come from the
    # builder's own quiet-machine sweep (SPARK_GRAFT_BENCH_PROVENANCE=
    # builder-clean). The r14 driver sweep silently replaced the
    # committed 285.3 s builder map with its own 296.95 s artifact in
    # the working tree; full coverage alone cannot catch that, only the
    # marker can. Maps older than the marker ("provenance" absent) pass
    # with a warning so history stays checkable.
    prov = bench.get("provenance")
    if prov is not None and prov != "builder-clean":
        print(f"[bench-local] FAIL: {bench_path} provenance is "
              f"'{prov}', not 'builder-clean' — this is a driver or "
              f"ad-hoc artifact, not the builder's canonical "
              f"quiet-machine sweep. Re-run the full bench with "
              f"SPARK_GRAFT_BENCH_PROVENANCE=builder-clean before "
              f"committing it as the round's map.", file=sys.stderr)
        return 1
    if prov is None:
        print(f"[bench-local] WARN: {bench_path} predates the "
              f"provenance marker — cannot distinguish builder from "
              f"driver artifact")
    print(f"[bench-local] OK: {bench_path} covers all {len(declared)} "
          f"declared queries ({len(benched)} benched"
          + (f", provenance {prov}" if prov else "") + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
