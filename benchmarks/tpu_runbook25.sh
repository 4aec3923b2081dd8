#!/bin/bash
# Runbook v25 (round 5): fill the serving menu's remaining cells.
#  1. Flagship LN-bound both trunks on the TRAINED proxy at serving
#     scale (1022 px) — the cheap non-calib point's only trained verdict
#     so far is the 224 px CPU ladder; confirm at real token counts.
#  2. Flagship calib chain via the NEW no-env-var default (auto proxy
#     load, quality_proxy=trained tag) — re-confirms r4 v16's PASS with
#     the r5 default path.
#  3. DepthFM deepcache2 + DYNAMIC int8 (16.69 img/s full-size, r3) —
#     calib scales failed the trained gate (0.109) but dynamic per-call
#     scales are tighter; if this passes, the gated DepthFM
#     recommendation moves 16.18 -> 16.69.
cd /root/repo
RUNBOOK=v25; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v24
NP="AMODAL_BENCH_NO_PROBE=1"
Q="AMODAL_QUALITY=1"

run 4800 "flagship trained-proxy verdict @1022: int8 LN-bound both trunks" /tmp/b25_flag_ln.log \
  $NP $Q AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 python bench.py

run 6000 "flagship trained-proxy verdict @1022: calib chain via r5 default (no proxy env var)" /tmp/b25_flag_calib.log \
  $NP $Q AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 python bench.py

run 3600 "depthfm trained-proxy verdict: deepcache2 + DYNAMIC int8 (16.69 img/s candidate)" /tmp/b25_dfm_dc2dyn.log \
  $NP $Q AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 AMODAL_INT8_DEPTHFM=1 python bench.py

runbook_done
