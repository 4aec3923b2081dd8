#!/bin/bash
# Runbook v26 (round 5): CLEAN redo of the v24 warm-start rows. v24's
# wait_for raced (launcher backgrounded the commit+launch chain, so the
# pid check ran before v23 wrote its marker) and its rows shared the
# chip/tunnel with v23 — the MECHANISM evidence was valid (sam_first
# 305 s lazy -> 8.6-13.6 s with the bulk restore) but every wall number
# was polluted. Everything is seeded now (bf16 serving ckpt, compile
# caches), the chip is otherwise idle.
cd /root/repo
RUNBOOK=v26; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v25
NP="AMODAL_BENCH_NO_PROBE=1"

run 3600 "COMPOSED bf16 warm start CLEAN (load_serving bulk, warm cache; target <150 s)" /tmp/b26_composed.log \
  $NP AMODAL_HEUR_DTYPE=bfloat16 AMODAL_HEUR_SERVING=/tmp/heur_serving_bf16 AMODAL_BENCH_HEURISTICS=1 python bench.py

run 3600 "f32 load_serving bulk restore CLEAN (vs 305 s lazy / 179.4 s init)" /tmp/b26_f32load.log \
  $NP AMODAL_HEUR_SERVING=/tmp/heur_serving_tpu AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
