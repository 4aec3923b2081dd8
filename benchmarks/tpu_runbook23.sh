#!/bin/bash
# Runbook v23 (round 5): re-verdict the generative + heuristics quality
# ladders on TRAINED proxies at serving scale (round-4 VERDICT item 2).
# Round 4 proved random-weight proxies give wrong gate verdicts (calib
# chain: random-FAIL 0.129 -> trained-PASS 0.039); the DepthFM ladder's
# FAILs (deepcache2 0.197, dc2+int8 ~0.29, tome 0.164) and the p2g
# razor-margin PASS (0.0499/0.05) were all judged on jittered-random
# weights. bench.py now auto-loads checkpoints/proxy for AMODAL_QUALITY
# runs (proxy=trained tag in every metric line).
#
# NOTE on the img/s numbers in these rows: the proxy model is narrow
# (mc=48) so throughput here is NOT the serving number — the verdicts
# are what these rows produce; the serving menu pairs them with the
# full-size exact/optimized rates from r2-r4.
cd /root/repo
RUNBOOK=v23; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v22
NP="AMODAL_BENCH_NO_PROBE=1"
Q="AMODAL_QUALITY=1"

# --- DepthFM ladder on the trained proxy (512 px serving latent grid) ---
run 3600 "depthfm trained-proxy verdict: deepcache2 (was random-FAIL 0.197)" /tmp/b23_dfm_dc2.log \
  $NP $Q AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 python bench.py

run 3600 "depthfm trained-proxy verdict: deepcache2 + int8 calib (was random-FAIL ~0.29)" /tmp/b23_dfm_dc2int8.log \
  $NP $Q AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 AMODAL_INT8_DEPTHFM=calib python bench.py

run 3600 "depthfm trained-proxy verdict: tome 0.75 (was random-FAIL 0.164)" /tmp/b23_dfm_tome.log \
  $NP $Q AMODAL_BENCH_DEPTHFM=1 AMODAL_TOME_DEPTHFM=0.75 python bench.py

run 3600 "depthfm trained-proxy verdict: int8 weight-only (p50 lever)" /tmp/b23_dfm_wo.log \
  $NP $Q AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=wo python bench.py

# --- p2g / heuristics on the trained proxy (256 px, 100-step DDIM) ---
run 4800 "p2g trained-proxy verdict: wo-int8 + deepcache5 (razor-margin random-PASS 0.0499/0.05)" /tmp/b23_p2g_wodc5.log \
  $NP $Q AMODAL_BENCH_HEURISTICS=1 AMODAL_DEEPCACHE_P2G=5 AMODAL_INT8_P2G=1 python bench.py

run 4800 "p2g trained-proxy verdict: deepcache5 alone" /tmp/b23_p2g_dc5.log \
  $NP $Q AMODAL_BENCH_HEURISTICS=1 AMODAL_DEEPCACHE_P2G=5 python bench.py

# --- NEW r5 knob: bf16 heuristics serving stack (cast_to) ---
run 4800 "p2g trained-proxy verdict: bf16 stack (new r5 knob)" /tmp/b23_p2g_bf16q.log \
  $NP $Q AMODAL_BENCH_HEURISTICS=1 AMODAL_HEUR_DTYPE=bfloat16 python bench.py

run 4800 "heuristics FULL-SIZE perf: bf16 stack (vs 4.1 s exact f32)" /tmp/b23_p2g_bf16perf.log \
  $NP AMODAL_BENCH_HEURISTICS=1 AMODAL_HEUR_DTYPE=bfloat16 python bench.py

run 4800 "heuristics FULL-SIZE perf: bf16 + deepcache5 stack" /tmp/b23_p2g_bf16dc5.log \
  $NP AMODAL_BENCH_HEURISTICS=1 AMODAL_HEUR_DTYPE=bfloat16 AMODAL_DEEPCACHE_P2G=5 python bench.py

runbook_done
