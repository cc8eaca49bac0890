#!/bin/bash
# Serial on-chip measurement sweep — run after a tunnel outage or a kernel
# change to refresh every recorded number. Each phase logs to output/sweep/.
# Usage: bash scripts/onchip_sweep.sh  (takes ~1-2h cold through the tunnel;
# compiles are cached across runs by the persistent compile cache)
set -u
cd "$(dirname "$0")/.."
mkdir -p output/sweep

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  /usr/bin/time -v timeout 3600 "$@" >"output/sweep/$name.json" 2>"output/sweep/$name.err"
  rc=$?
  echo "--- rc=$rc"
  tail -2 "output/sweep/$name.json" 2>/dev/null
  grep -E "Elapsed|Maximum resident" "output/sweep/$name.err" 2>/dev/null
}

run bench            python bench.py
run bench_train      python bench_train.py
run bench_train_svd  python bench_train_svd.py
run bench_svd        python bench_svd.py
echo "sweep done; see output/sweep/"
