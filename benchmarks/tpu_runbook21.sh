#!/bin/bash
# Runbook v21 (round 4): the composed warm-start number. v20 proved the
# pieces — load_serving drops param init 671 -> 53 s, the compile cache
# drops sam/p2g first-calls to 12-24 s on a healthy pass — but no single
# v20 row ran with ALL pieces warm on a healthy tunnel (its load row hit
# mid-row degradation: 305 s for a CACHED sam program is tunnel
# latency). One row, everything seeded, healthy-gate in front.
cd /root/repo
RUNBOOK=v21; OUT=benchmarks/RESULTS_r04_tpu.md
source benchmarks/runbook_lib.sh
echo $$ > /tmp/runbookv21.pid
log "runbook v21 start"
wait_for runbook20
NP="AMODAL_BENCH_NO_PROBE=1 AMODAL_TPU_CACHE=1"
run 2400 "heuristics warm start COMPOSED (serving ckpt + compile cache, healthy tunnel)" /tmp/b21_composed.log \
  $NP AMODAL_HEUR_SERVING=/tmp/heur_serving_tpu AMODAL_BENCH_HEURISTICS=1 python bench.py
runbook_done
