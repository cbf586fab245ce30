#!/bin/bash
# CI gate: lint + fast suite (includes the end-to-end FastSMC/ASMC smokes)
# + AddressSanitizer leg for the native C++ scan — the repo equivalent of
# the reference's GitHub workflow matrix (SURVEY.md §4: unit, regression,
# python, ubuntu-asan jobs; the NO_SSE leg has no analog because the
# device engine is pure JAX).
#
# Usage: scripts/ci.sh [--slow]   (--slow adds the long e2e suite)
set -e
cd "$(dirname "$0")/.."
PY=${PY:-/opt/venv/bin/python}

echo "== lint (syntax + import) =="
# no flake8/pyflakes in this image: gate on byte-compilation of every
# source file plus a clean package import
$PY -m compileall -q fastsmc_tpu tests scripts bench.py __graft_entry__.py
$PY -c "import fastsmc_tpu, fastsmc_tpu.compat, fastsmc_tpu.cli"

echo "== fast suite (incl. e2e smokes) =="
$PY -m pytest tests/ -q

echo "== ASan leg (native C++ scan under AddressSanitizer) =="
# mirror of the reference's ubuntu-asan workflow (CMakeLists.txt:229-242):
# rebuild libfastsmc_native.so with -fsanitize=address and drive the
# hashing scan + RNG entry points through the python test suite.
# LD_PRELOAD is required because the host process (python) is uninstrumented;
# leak detection is off (the interpreter itself "leaks" at exit).
LIBASAN=$(g++ -print-file-name=libasan.so)
if [ -f "$LIBASAN" ] || [ -L "$LIBASAN" ]; then
  FASTSMC_NATIVE_CXXFLAGS="-fsanitize=address -fsanitize-address-use-after-scope -g -O1" \
    LD_PRELOAD="$LIBASAN" ASAN_OPTIONS="detect_leaks=0:abort_on_error=1" \
    $PY -m pytest tests/test_hashing.py tests/test_rng.py -q
else
  echo "libasan not found; skipping ASan leg"
fi

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
