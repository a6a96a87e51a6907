#!/usr/bin/env bash
# One-shot reproduction: build, test, correctness vs DuckDB, bench.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_CORRECTNESS=${SF_CORRECTNESS:-/root/testdata/sf0.01}
SF_BENCH=${SF_BENCH:-/root/testdata/sf0.1}
OUT=${OUT:-/tmp/graft_verify}

echo "== compile + test =="
sbt -batch test

echo "== correctness dump ($SF_CORRECTNESS) =="
rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch "runMain graft.Verify $SF_CORRECTNESS $OUT"

echo "== DuckDB oracle compare =="
python3 scripts/oracle_check.py "$SF_CORRECTNESS" "$OUT"

echo "== bench ($SF_BENCH) =="
SPARK_GRAFT_SF_DIR="$SF_BENCH" sbt -batch "runMain graft.Bench" | grep '"metric"'
