#!/bin/bash
# CI gate: lint + fast suite (includes the end-to-end FastSMC/ASMC smokes)
# — the repo equivalent of the reference's GitHub workflow matrix
# (SURVEY.md §4: unit, regression, python jobs; the NO_SSE/ASan legs have
# no analog here because the engine is pure JAX + optional C++ scan).
#
# Usage: scripts/ci.sh [--slow]   (--slow adds the long e2e suite)
set -e
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python

echo "== lint (syntax + import) =="
# no flake8/pyflakes in this image: gate on byte-compilation of every
# source file plus a clean package import
$PY -m compileall -q fastsmc_tpu tests scripts bench.py __graft_entry__.py
$PY -c "import fastsmc_tpu, fastsmc_tpu.compat, fastsmc_tpu.cli"

echo "== fast suite (incl. e2e smokes) =="
$PY -m pytest tests/ -q

if [ "$1" = "--slow" ]; then
  echo "== slow e2e suite =="
  FASTSMC_RUN_SLOW=1 $PY -m pytest tests/ -q -m slow
fi

echo "== graft entry compile check =="
timeout 900 $PY -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
"
echo "CI OK"
