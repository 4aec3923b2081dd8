#!/bin/bash
# Runbook v32 (round 5, fresh host): (1) seed the TPU compile cache on
# THIS box with the exact default-bench path — the driver's end-of-round
# BENCH_r05 run must find a warm cache (benchmarks/.jax_cache_tpu was
# empty after the host reset) — and record the r5 exact regression row;
# (2) full-size DepthFM deepcache=2,2: runbook v29's trained-proxy
# verdict PASSed it (delta 0.043 = same band as dc2-G3's 0.043) with
# TWO shallow groups instead of three — fewer cached-step FLOPs, so it
# may beat the 16.18 img/s recommendation. Exact + dc2-G3 controls run
# back-to-back in the same session (the only ±8%-noise-proof protocol).
cd /root/repo
RUNBOOK=v32; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
NP="AMODAL_BENCH_NO_PROBE=1"

run 6000 "fresh-host exact default bench (seeds driver cache; r3-r5 band 3.10-3.16)" /tmp/b32_exact.log \
  $NP python bench.py

run 3600 "dc2,2 session control: depthfm exact (r2-r5 band 13.1-14.4)" /tmp/b32_dfm_exact.log \
  $NP AMODAL_BENCH_DEPTHFM=1 python bench.py

run 3600 "dc2,2 session control: depthfm deepcache2 G=3 (recommended, 16.18)" /tmp/b32_dfm_dc2.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 python bench.py

run 3600 "depthfm deepcache=2,2 FULL-SIZE (trained-proxy PASS 0.043; candidate > 16.18)" /tmp/b32_dfm_dc22.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 python bench.py

runbook_done
