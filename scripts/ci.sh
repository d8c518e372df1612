#!/usr/bin/env bash
# CI gates for loftr_tpu.  (Reference has no test suite at all; SURVEY.md §4
# defines the strategy this implements.)
#
#   scripts/ci.sh fast    - default merge gate: CPU, slow/heavy deselected,
#                           4-way xdist (pytest.ini addopts).  ~4.5 min on an
#                           8-core box (persistent compile cache).
#   scripts/ci.sh full    - the whole surface incl. `heavy` kernel/solver
#                           stress tests and `slow` learning checks (~19 min).
#   scripts/ci.sh heavy   - only the heavy/slow sets.
#   scripts/ci.sh contract- driver contract: entry() jit compile (single
#                           chip if a TPU is attached, else CPU) + the
#                           8-fake-device multichip dryrun (mesh train step,
#                           ckpt round-trip, seq-parallel coarse stage).
#
# Every gate exits non-zero on the first failure (-x).
set -euo pipefail
cd "$(dirname "$0")/.."

case "${1:-fast}" in
  fast)
    exec python -m pytest tests/ -x -q
    ;;
  full)
    exec python -m pytest tests/ -x -q -m "" -p no:cacheprovider
    ;;
  heavy)
    exec python -m pytest tests/ -x -q -m "slow or heavy"
    ;;
  contract)
    python __graft_entry__.py
    # Append (not overwrite) so caller-provided XLA debug/tuning flags survive.
    exec env XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8" \
        JAX_PLATFORMS=cpu python __graft_entry__.py dryrun 8
    ;;
  *)
    echo "usage: scripts/ci.sh {fast|full|heavy|contract}" >&2
    exit 2
    ;;
esac
