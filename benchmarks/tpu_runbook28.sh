#!/bin/bash
# Runbook v28 (round 5): attribute the 436.7 s clean bf16 restore wall
# (v26 — far above the ~100 s transfer bound for ~2.9 GB at 30.8 MB/s).
# Suspects: the ~45 per-chunk split-program compiles through the tunnel
# (sub-2 s compiles do not persist in the cache), the Orbax host read,
# or device_put dispatch. AMODAL_RESTORE_DEBUG=1 prints the phase
# breakdown; back-to-back rows separate first-run (compile) from
# second-run (cached) cost.
cd /root/repo
RUNBOOK=v28; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v27
NP="AMODAL_BENCH_NO_PROBE=1"
BF="AMODAL_HEUR_DTYPE=bfloat16 AMODAL_HEUR_SERVING=/tmp/heur_serving_bf16 AMODAL_RESTORE_DEBUG=1"

run 3600 "bf16 restore PHASE BREAKDOWN run A (orbax read / concat / put / split-jit)" /tmp/b28_phaseA.log \
  $NP $BF AMODAL_BENCH_HEURISTICS=1 python bench.py

run 3600 "bf16 restore PHASE BREAKDOWN run B (back-to-back; split programs warm?)" /tmp/b28_phaseB.log \
  $NP $BF AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
