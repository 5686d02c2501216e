#!/bin/bash
# r16 pairs_solve A/B at sf30 (the r15 verdict's #5): interleaved arms,
# >=2 runs each, through graft.tools.CcDecompose (pinned pair graph,
# cluster counts printed per run so identity is checkable in the log).
#   arm A: packed attach (r12 default), band shards 2 (sf30 default)
#   arm B: inline attach (r16), band shards 2
# plus a shard sweep on the winner: shards 1 / 2 / 4.
set -u
cd "$(dirname "$0")/.."
SF=${SF:-testdata/sf30}
LOG=${LOG:-benchlogs/r16_sf30_pairs_ab.log}
echo "== r16 pairs A/B dir=$SF $(date -u +%FT%TZ) loadavg=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG"
for rep in 1 2; do
  for mode in packed inline; do
    echo "-- rep$rep mode=$mode shards=2" | tee -a "$LOG"
    SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_SIG_ATTACH=$mode \
      tools/jrun.sh graft.tools.CcDecompose 2>&1 | grep -E "CCDECOMP|rounds=" | tee -a "$LOG"
  done
done
echo "== shard sweep (winner mode set via SWEEP_MODE env, default inline)" | tee -a "$LOG"
for shards in 1 4; do
  echo "-- sweep mode=${SWEEP_MODE:-inline} shards=$shards" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_SIG_ATTACH=${SWEEP_MODE:-inline} \
    SPARK_GRAFT_BAND_SHARDS=$shards \
    tools/jrun.sh graft.tools.CcDecompose 2>&1 | grep -E "CCDECOMP|rounds=" | tee -a "$LOG"
done
echo "== done $(date -u +%FT%TZ)" | tee -a "$LOG"
