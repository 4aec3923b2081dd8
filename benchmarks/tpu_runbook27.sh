#!/bin/bash
# Runbook v27 (round 5): r5 full-size perf re-confirmation of the
# serving menu's RECOMMENDED operating points (the v23/v25 proxy rows
# produced the verdicts; their img/s columns are narrow-proxy rates).
# One session, back-to-back, warm caches — the only comparison class
# the ±8% tunnel noise allows.
cd /root/repo
RUNBOOK=v27; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v26
NP="AMODAL_BENCH_NO_PROBE=1"

run 6000 "r5 full-size perf: flagship calib chain (menu row; r3-r4: 3.727 img/s)" /tmp/b27_flag_calib.log \
  $NP AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 python bench.py

run 3600 "r5 full-size perf: depthfm exact control (r2-r4 band 13.1-14.3 img/s)" /tmp/b27_dfm_exact.log \
  $NP AMODAL_BENCH_DEPTHFM=1 python bench.py

run 3600 "r5 full-size perf: depthfm deepcache2 RECOMMENDED (r2: 16.18 img/s)" /tmp/b27_dfm_dc2.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 python bench.py

run 3600 "r5 full-size perf: depthfm int8-wo p50 lever (r3: p50 95 ms)" /tmp/b27_dfm_wo.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=wo AMODAL_BENCH_BATCH=1 python bench.py

runbook_done
