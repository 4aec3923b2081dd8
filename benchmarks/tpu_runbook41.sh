#!/bin/bash
# Runbook v41 (round 5, continuation): port the DepthFM G=2 frontier
# move to the pix2gestalt DDIM. The heuristics rec is wo-int8+dc5 G=3
# (2.17 s/completion, trained-proxy PASS 0.0372). The 100-step loop is
# param-READ-bound, so refreshing one fewer shallow group per cached
# step cuts exactly the bytes it is bound on; DepthFM's (2,2) showed
# the delta can hold while rate improves. Gates run FIRST (proxy-width,
# cheap) and full-size rates only for gate-PASS points, with a G=3
# same-session control for the ±8% cross-session noise.
cd /root/repo
RUNBOOK=v41; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v40
NP="AMODAL_BENCH_NO_PROBE=1"
H="AMODAL_BENCH_HEURISTICS=1 AMODAL_INT8_P2G=1"

run 3600 "p2g wo+dc5,G2 GATE (trained proxy; G=3 PASSed 0.0372)" /tmp/b41_gate52.log \
  $NP $H AMODAL_DEEPCACHE_P2G=5,2 AMODAL_QUALITY=1 python bench.py

if grep -q '"pass": true' /tmp/b41_gate52.log; then
  run 3600 "p2g wo+dc5 G=3 full-size control (rec, 2.17 s r3/v23 band)" /tmp/b41_rate53.log \
    $NP $H AMODAL_DEEPCACHE_P2G=5 python bench.py
  run 3600 "p2g wo+dc5,G2 full-size s/completion (gated candidate < 2.17)" /tmp/b41_rate52.log \
    $NP $H AMODAL_DEEPCACHE_P2G=5,2 python bench.py
else
  log "dc5,G2 gate FAIL — skipping full-size rates"
fi

run 3600 "p2g wo+dc5,G1 GATE (frontier probe: only the top group refreshed)" /tmp/b41_gate51.log \
  $NP $H AMODAL_DEEPCACHE_P2G=5,1 AMODAL_QUALITY=1 python bench.py

if grep -q '"pass": true' /tmp/b41_gate51.log; then
  run 3600 "p2g wo+dc5,G1 full-size s/completion" /tmp/b41_rate51.log \
    $NP $H AMODAL_DEEPCACHE_P2G=5,1 python bench.py
else
  log "dc5,G1 gate FAIL — skipping full-size rate"
fi

runbook_done
