#!/bin/bash
# Runbook v24 (round 5): the composed bf16 warm start. v22 measured the
# restore path pieces: bulk h2d runs 30.8 MB/s at 64 MB chunks (vs
# 4.3 MB/s per-leaf lazy — the old 305 s wall), and the f32 stack is
# ~5.8-7 GB so f32 restore can never beat the 179.4 s on-device init on
# this tunnel. bf16 halves the bytes: seed a bf16 serving checkpoint
# (row 1, also warms the bf16 compile cache), then measure the composed
# restore-based warm start (row 2) — target first_pixel < 150 s
# (round-4 VERDICT item 3).
cd /root/repo
RUNBOOK=v24; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v23
NP="AMODAL_BENCH_NO_PROBE=1"
BF="AMODAL_HEUR_DTYPE=bfloat16 AMODAL_HEUR_SERVING=/tmp/heur_serving_bf16"

# f32 bulk-restore mechanism check (re-run of v22 row 3 after the
# per-chunk split fix — the whole-tree split jit OOMed 16 GB HBM at 2x
# the 7 GB stack): param_init should absorb the transfer at ~bulk rate
# and sam_first should drop from ~305 s (lazy) to compile-hit time.
run 3600 "f32 load_serving with per-chunk BULK restore (v22 row 3 redo)" /tmp/b24_f32load.log \
  $NP AMODAL_HEUR_SERVING=/tmp/heur_serving_tpu AMODAL_BENCH_HEURISTICS=1 python bench.py

run 4800 "bf16 serving ckpt SEED (init + cast + save + bf16 compile-cache warm)" /tmp/b24_seed.log \
  $NP $BF AMODAL_BENCH_HEURISTICS=1 python bench.py

run 3600 "COMPOSED bf16 warm start: load_serving(bulk, half bytes) + warm cache (target <150 s)" /tmp/b24_composed.log \
  $NP $BF AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
