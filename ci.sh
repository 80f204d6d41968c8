#!/usr/bin/env bash
# CI entry point: both test lanes + the multi-chip dry run.
#
# Lane layout (pyproject.toml addopts deselect `slow` + `tpu_tunnel`):
#   default lane  — one representative per family, <10 min warm
#   slow lane     — the exhaustive grids (full rotated vine families,
#                   the reference's 7-case Beta matrix, statistical
#                   sweeps), opt-in via -m slow
# TPU-tunnel tests (-m tpu_tunnel) need live hardware and are excluded
# from CI; the on-chip story is the validation sweep
# (examples/tpu_validation_sweep.py) and bench.py.
set -euo pipefail
cd "$(dirname "$0")"

echo "== default lane =="
python -m pytest tests/ -q

echo "== slow lane =="
python -m pytest tests/ -q -m "slow and not tpu_tunnel"

echo "== multi-chip dryrun (8 virtual devices) =="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "CI GREEN"
