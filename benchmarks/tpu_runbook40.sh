#!/bin/bash
# Runbook v40 (round 5, continuation): v39's gate row runs at the
# trained-proxy WIDTH (AMODAL_QUALITY=1 swaps the narrow proxy in), so
# the dc(2,2)+wo stack still needs its FULL-SIZE b8 rate. Same-session
# comparator is v39's dc(2,2) control row.
cd /root/repo
RUNBOOK=v40; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v39
NP="AMODAL_BENCH_NO_PROBE=1"

run 3600 "depthfm deepcache=2,2 + int8=wo FULL-SIZE b8 rate (dc22 control in v39)" /tmp/b40_dfm_dc22_wo_b8.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 AMODAL_INT8_DEPTHFM=wo python bench.py

runbook_done
