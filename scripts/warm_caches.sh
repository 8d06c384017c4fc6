#!/usr/bin/env bash
# Warm the per-host JAX compile caches so the driver's end-of-round
# artifacts don't pay cold compiles (round-4 BENCH paid 341.8 s compile;
# the round-3c worst case was 1205.8 s through the tunnel, and the
# round-4 MULTICHIP record was killed at rc=124 mid-compile).
#
# Run ONCE at round start and AGAIN near round end on the active host:
#   bash scripts/warm_caches.sh [--skip-bench] [--skip-dryrun]
#
# Warms:
#   /tmp/jax_tpu_cache    — bench.py's MiT-B5 EMA step (REAL TPU; do not
#                           run while any other process holds the tunnel)
#   /tmp/jax_dryrun_cache — dryrun_multichip(8)'s virtual-CPU programs
#
# Measured round 5 (1-vCPU host): bench cold compile 305.8 s -> warm
# re-run skips it; dryrun cold ~496 s -> 88.6 s warm.
set -u
cd "$(dirname "$0")/.."

SKIP_BENCH=0
SKIP_DRYRUN=0
for a in "$@"; do
  case "$a" in
    --skip-bench) SKIP_BENCH=1 ;;
    --skip-dryrun) SKIP_DRYRUN=1 ;;
    *) echo "unknown arg: $a" >&2; exit 2 ;;
  esac
done

rc=0
if [ "$SKIP_DRYRUN" = 0 ]; then
  echo "[warm_caches] dryrun_multichip(8) -> /tmp/jax_dryrun_cache"
  if ! timeout 900 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"; then
    echo "[warm_caches] WARNING: dryrun warm-up failed" >&2
    rc=1
  fi
fi
if [ "$SKIP_BENCH" = 0 ]; then
  echo "[warm_caches] bench.py -> /tmp/jax_tpu_cache (TPU; cold can take 5-20 min)"
  if ! timeout 2400 python bench.py; then
    echo "[warm_caches] WARNING: bench warm-up failed" >&2
    rc=1
  fi
fi
echo "[warm_caches] done rc=$rc"
exit "$rc"
