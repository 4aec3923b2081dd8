#!/bin/bash
# Runbook v39 (round 5, continuation session): the host was reset AGAIN
# after v38 (benchmarks/.jax_cache_tpu is empty), so row 1 re-seeds the
# TPU compile cache with the exact default-bench path the driver's
# end-of-round BENCH_r05 snapshot runs — and doubles as this session's
# exact regression row (r3-r5 band 3.10-3.16).
# Rows 2-4 close the one unmeasured point on the DepthFM serving menu:
# deepcache(2,2) [gated rec, 17.29-17.36 img/s, PASS 0.043] stacked
# with int8 WEIGHT-ONLY. The dc2+int8 FAILs on trained weights were
# calib (0.109) and dynamic (0.121) — both ACTIVATION-quant schemes;
# wo alone PASSes 0.031 with no activation error, so the stack is the
# remaining plausible gate-passing operating point (b1 p50 candidate:
# dc2,2 is 80 ms, wo alone read 124 ms amortized).
cd /root/repo
RUNBOOK=v39; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
NP="AMODAL_BENCH_NO_PROBE=1"

run 6000 "reset-host exact default bench (re-seeds driver cache; band 3.10-3.16)" /tmp/b39_exact.log \
  $NP python bench.py

run 3600 "dc22+wo session control: depthfm deepcache=2,2 (rec, 17.29-17.36)" /tmp/b39_dfm_dc22.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 python bench.py

run 3600 "depthfm deepcache=2,2 + int8=wo GATED (trained proxy; dc+activation-int8 FAILed, wo alone PASSed 0.031)" /tmp/b39_dfm_dc22_wo.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 AMODAL_INT8_DEPTHFM=wo AMODAL_QUALITY=1 python bench.py

run 3600 "depthfm b1 p50: deepcache=2,2 + int8=wo (dc22 alone: 80 ms)" /tmp/b39_dfm_dc22_wo_b1.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,2 AMODAL_INT8_DEPTHFM=wo AMODAL_BENCH_BATCH=1 python bench.py

runbook_done
