#!/bin/bash
# Runbook v29 (round 5): DeepCache frontier on the TRAINED proxies.
# The gated recommendations sit at conservative points chosen under the
# (now known misleading) random proxy: DepthFM dc interval 2 / groups 3,
# p2g interval 5. More aggressive points were never judged fairly:
#  - dfm "2,2": fewer shallow groups per cached step = faster than the
#    16.18 img/s recommendation if the trained gate passes.
#  - dfm "4,3": one full pass per 4-step eval — the aggressive end.
#  - p2g wo-int8 + interval 10: r2 measured 2.33 s/completion ("past
#    the knee", 2x delta on random weights) — trained verdict unknown.
# Quality rows first (proxy), then full-size perf for the candidates.
cd /root/repo
RUNBOOK=v29; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v28
NP="AMODAL_BENCH_NO_PROBE=1"
Q="AMODAL_QUALITY=1"

run 3600 "depthfm trained-proxy verdict: deepcache 2,2 (faster-than-recommended candidate)" /tmp/b29_dfm_dc22q.log \
  $NP $Q AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 python bench.py

run 3600 "depthfm trained-proxy verdict: deepcache 4,3 (aggressive end)" /tmp/b29_dfm_dc43q.log \
  $NP $Q AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=4,3 python bench.py

run 4800 "p2g trained-proxy verdict: wo-int8 + deepcache10 (2.33 s candidate)" /tmp/b29_p2g_wodc10q.log \
  $NP $Q AMODAL_BENCH_HEURISTICS=1 AMODAL_DEEPCACHE_P2G=10 AMODAL_INT8_P2G=1 python bench.py

run 3600 "r5 full-size perf: depthfm deepcache 2,2" /tmp/b29_dfm_dc22p.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 python bench.py

run 4800 "r5 full-size perf: p2g wo-int8 + deepcache10" /tmp/b29_p2g_wodc10p.log \
  $NP AMODAL_BENCH_HEURISTICS=1 AMODAL_DEEPCACHE_P2G=10 AMODAL_INT8_P2G=1 python bench.py

runbook_done
