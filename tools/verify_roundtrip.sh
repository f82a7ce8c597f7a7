#!/usr/bin/env bash
# One-command correctness roundtrip: run graft.Verify (Spark dump) then
# tools/check_oracle.py (local mirror of the driver's DuckDB compare)
# into a single output dir.
#
# Usage:
#   tools/verify_roundtrip.sh [sfDir] [outDir] [onlyCsv]
#
#   sfDir   default /root/testdata/sf0.01
#   outDir  default /tmp/verify_rt (wiped per run)
#   onlyCsv optional comma-separated query subset (SPARK_GRAFT_ONLY)
#
# Exit code is check_oracle.py's (1 on any mismatch).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_rt}"
ONLY="${3:-}"

rm -rf "$OUT_DIR"
mkdir -p "$OUT_DIR"

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
if [ ! -d target/scala-2.13/classes/graft ]; then
  echo "[roundtrip] classes missing — run 'sbt compile' first" >&2
  exit 2
fi

echo "[roundtrip] Verify: sf=$SF_DIR out=$OUT_DIR only=${ONLY:-ALL}"
# an empty-but-set SPARK_GRAFT_ONLY would filter to ZERO queries
if [ -n "$ONLY" ]; then export SPARK_GRAFT_ONLY="$ONLY"; else unset SPARK_GRAFT_ONLY; fi
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  java -Xmx24g \
  --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/jdk.internal.misc=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  -cp "$CP" graft.Verify "$SF_DIR" "$OUT_DIR"

echo "[roundtrip] oracle dtype lint (static DESCRIBE)"
python3 tools/lint_oracle_dtypes.py "$OUT_DIR/oracle_sql.json" "$SF_DIR"

# BENCH_LOCAL.json gates — both fire only when the working tree
# differs from HEAD's copy, i.e. when a fresh bench run is a candidate
# for commit. An unchanged (already-committed) map has already passed
# them, and a mid-round roundtrip for a freshly DECLARED query would
# otherwise fail on a map that legitimately predates the query (the
# closing ritual still can't be skipped: each round commits a fresh
# full map, which is by definition a modified file).
if ! git diff --quiet HEAD -- BENCH_LOCAL.json 2>/dev/null; then
  echo "[roundtrip] BENCH_LOCAL.json completeness (subset-run trap guard)"
  # A scoped SPARK_GRAFT_ONLY bench overwrites BENCH_LOCAL.json with a
  # subset map; committing that loses the round's full per-query record
  # (hit in r10 AND r12 despite a written warning).
  python3 tools/check_bench_local.py "$OUT_DIR/oracle_sql.json"
  # Uniform-load adjudication (the r13 hand-run comparison, automated):
  # the candidate map is compared against the last committed CLEAN map
  # over steady shuffle-identical queries; a median wall ratio >1.10 is
  # a uniformly loaded machine the in-run sentinel cannot see.
  echo "[roundtrip] uniform-load adjudication (BENCH_LOCAL.json changed)"
  python3 tools/adjudicate_bench.py BENCH_LOCAL.json
fi

echo "[roundtrip] DuckDB compare"
python3 tools/check_oracle.py "$OUT_DIR" "$SF_DIR"
