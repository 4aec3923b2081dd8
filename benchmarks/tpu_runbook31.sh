#!/bin/bash
# Runbook v31 (round 5): f32 Orbax-fallback restore control with the
# per-group sync fix (v28's control OOMed via async over-allocation).
# Expected: bounded memory, param_init ~ orbax read + transfer at the
# bulk rate; still slower than bf16/min-bytes stacks — the row exists
# to prove the f32 path WORKS and to quantify its floor.
cd /root/repo
RUNBOOK=v31; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v30
NP="AMODAL_BENCH_NO_PROBE=1"

run 3600 "f32 Orbax-fallback bulk restore control (per-group sync fix)" /tmp/b31_f32ctl.log \
  $NP AMODAL_HEUR_SERVING=/tmp/heur_serving_tpu AMODAL_RESTORE_DEBUG=1 AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
