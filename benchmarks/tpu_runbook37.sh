#!/bin/bash
# Runbook v37 (round 5, final): the exact-path regression row AFTER the
# session's churn (host-split restore default, runbooks v30-v36) — the
# default bench path is untouched by that change, and this row proves
# it in-session (VERDICT-r4 item 8 discipline). Warm cache; also the
# last same-session confirmation of the dc(2,2) recommendation.
cd /root/repo
RUNBOOK=v37; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v36
NP="AMODAL_BENCH_NO_PROBE=1"

run 3600 "final r5 exact regression (post host-split churn; band 3.10-3.16)" /tmp/b37_exact.log \
  $NP python bench.py

run 3600 "final r5 depthfm dc2,2 confirmation (v32: 17.36)" /tmp/b37_dc22.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 python bench.py

runbook_done
