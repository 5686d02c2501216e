#!/bin/bash
# Per-round MULTI-JVM gate (r11 verdict #2): run the full Verify dump under
# a local-cluster master (two separate executor JVMs — every codegen
# expression and closure crosses a real serialization boundary), compare
# against the DuckDB oracle, and commit the result as a driver-shaped
# artifact so a serialization regression is impossible to miss. Then a
# min-of-3 Bench under the same master for the cluster timing row (r12
# verdict #5: the runs=1 artifact had all-zero spreads and shifted 177 →
# 172.7 s between two regenerations at one HEAD — too noisy to compare
# round-over-round). SPARK_GRAFT_BENCH_RUNS still overrides for probes.
#
# Usage: tools/cluster_gate.sh <round> [sfDir]
#   → CORRECTNESS_r<round>_cluster.json, BENCH_r<round>_cluster.json
set -e
cd "$(dirname "$0")/.."
ROUND=${1:?usage: cluster_gate.sh <round> [sfDir]}
SF=${2:-/root/testdata/sf0.01}
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER='local-cluster[2,16,4096]'
OUT=/tmp/cluster_gate_r$ROUND
rm -rf "$OUT"
echo "[cluster_gate] Verify under $SPARK_GRAFT_MASTER on $SF ..."
tools/jrun.sh graft.Verify "$SF" "$OUT" 2>"$OUT.verify.err" \
  || { echo "[cluster_gate] Verify FAILED — tail of stderr:"; tail -20 "$OUT.verify.err"; exit 1; }
python3 tools/check.py "$SF" "$OUT" --json "CORRECTNESS_r${ROUND}_cluster.json" \
  | tail -3
BENCH_SF=${3:-/root/testdata/sf0.1}
RUNS=${SPARK_GRAFT_BENCH_RUNS:-3}
echo "[cluster_gate] Bench under $SPARK_GRAFT_MASTER ($RUNS runs, $BENCH_SF) ..."
SPARK_GRAFT_BENCH_RUNS=$RUNS SPARK_GRAFT_SF_DIR="$BENCH_SF" \
  tools/jrun.sh graft.Bench >"$OUT.bench.log" 2>"$OUT.bench.err" \
  || { echo "[cluster_gate] Bench FAILED — tail:"; tail -5 "$OUT.bench.err"; exit 1; }
head -1 bench_out.json > "BENCH_r${ROUND}_cluster.json"
tail -1 "$OUT.bench.log"
echo "[cluster_gate] wrote CORRECTNESS_r${ROUND}_cluster.json + BENCH_r${ROUND}_cluster.json"
