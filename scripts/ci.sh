#!/bin/bash
# CI entry point — the single-command answer to "is the repo green?"
# (the analogue of the reference's moncic-ci build matrix, README.md:1-4,
# which is build-only; here the gate is the full test suite).
#
# Tiers:
#   scripts/ci.sh            default: the FULL suite, one process, one
#                            invocation — the supported green contract
#                            (3x verified from both cold and warm compile
#                            cache in round 5; tests/conftest.py releases
#                            compiled executables between modules, which
#                            is what makes a single process viable on the
#                            8-virtual-device CPU backend)
#   scripts/ci.sh soak       + the multi-day soaks (CRITERIA3D_SOAK=1,
#                            ~tens of minutes on a 2-core host)
#   scripts/ci.sh bench      + a coarse-grid bench smoke (runs on
#                            whatever backend JAX selects; the real
#                            benchmark needs the TPU)
#
# Always run from the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."

TIER="${1:-default}"

echo "== criteria3d_tpu CI (${TIER}) =="
python -c "import jax, sys; print('jax', jax.__version__, 'python', sys.version.split()[0])"

case "$TIER" in
  default)
    python -m pytest tests/ -q
    ;;
  soak)
    CRITERIA3D_SOAK=1 python -m pytest tests/ -q
    ;;
  bench)
    python -m pytest tests/ -q
    BENCH_COARSEN=8 BENCH_HEAT=0 BENCH_PALLAS_LEG=0 python bench.py
    ;;
  *)
    echo "usage: scripts/ci.sh [default|soak|bench]" >&2
    exit 2
    ;;
esac
echo "== green =="
