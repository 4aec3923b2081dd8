#!/bin/bash
# Runbook v34 (round 5): b1 latency for the new DepthFM recommendation.
# v32 promoted deepcache (2,2) on b8 throughput (17.36 img/s); the menu
# p50 column is a BATCH-1 single-image number (exact 137 / G=3 120 ms),
# so measure (2,2) at b1 for the like-for-like latency row, with a b1
# G=3 control in the same session.
cd /root/repo
RUNBOOK=v34; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v33
NP="AMODAL_BENCH_NO_PROBE=1"

run 3600 "depthfm b1 p50 control: deepcache2 G=3 (prior rec, 120 ms)" /tmp/b34_dc2_b1.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 AMODAL_BENCH_BATCH=1 python bench.py

run 3600 "depthfm b1 p50: deepcache 2,2 (new rec — menu latency column)" /tmp/b34_dc22_b1.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 AMODAL_BENCH_BATCH=1 python bench.py

runbook_done
