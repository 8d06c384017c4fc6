#!/usr/bin/env bash
# Full-suite health artifact (VERDICT r4 weak #5): run the COMPLETE test
# suite once on the round's host and commit the summary so suite health
# is a recorded fact, not an inference from subsets.
#
#   bash scripts/run_suite.sh TESTS_r05.txt
#
# Notes (CLAUDE.md): on a 1-vCPU host the suite takes 45-150 min (cold
# compile cache is the difference); -n 4 overlaps compiles with
# execution even single-core. Tests force CPU (conftest), so this never
# touches the tunneled TPU and can run alongside TPU benchmarks.
set -u
cd "$(dirname "$0")/.."

OUT="${1:-TESTS_report.txt}"
TMP=$(mktemp)
START=$(date -u +%Y-%m-%dT%H:%M:%SZ)
T0=$(date +%s)

# pyproject addopts already apply -n 4 --dist loadfile; bound the whole
# run with coreutils timeout (pytest-timeout isn't installed here).
# Keep every FAILED/ERROR line plus the tail — tail alone can cut the
# short-summary list off (it did in the first r5 capture).
FULL=$(mktemp)
timeout "${SUITE_TIMEOUT:-12000}" python -m pytest tests/ -q -rf \
  > "$FULL" 2>&1
RC=$?
{ grep -E "^(FAILED|ERROR)" "$FULL"; echo; tail -40 "$FULL"; } > "$TMP"
rm -f "$FULL"
T1=$(date +%s)

{
  echo "# Full-suite health record"
  echo "date_utc: $START"
  echo "wall_s: $((T1 - T0))"
  echo "rc: $RC"
  echo "host: $(uname -m), $(nproc) vCPU, $(awk '/MemTotal/{printf "%.0fG", $2/1048576}' /proc/meminfo) RAM"
  echo "python: $(python -V 2>&1)"
  echo "jax: $(python -c 'import jax; print(jax.__version__)' 2>/dev/null)"
  echo "git: $(git rev-parse --short HEAD)"
  echo
  echo "## pytest tail"
  cat "$TMP"
} > "$OUT"
rm -f "$TMP"
echo "wrote $OUT (rc=$RC, $((T1 - T0))s)"
exit "$RC"
