#!/bin/bash
# Runbook v28 (round 5): the flat-sidecar restore path, end to end.
# v26 attribution: clean bf16 restore was 436.7 s (f32: 745.5 s) vs a
# ~100 s transfer bound — overhead-bound (Orbax host read + host
# re-concat + ~45 per-chunk split compiles), not transfer-bound.
# serving_ckpt now (a) fetches ONE bulk copy at save (group concat
# programs + chunk fetches) and writes raw chunk files alongside Orbax,
# (b) restores from the sidecar with raw disk reads + group split
# programs. Row A re-seeds the bf16 checkpoint through the new save
# (AMODAL_RESTORE_DEBUG prints the phase breakdown); row B is the
# COMPOSED warm start from the flat sidecar — the <150 s target row.
cd /root/repo
RUNBOOK=v28; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v27
NP="AMODAL_BENCH_NO_PROBE=1"
BF="AMODAL_HEUR_DTYPE=bfloat16 AMODAL_HEUR_SERVING=/tmp/heur_serving_bf16v2 AMODAL_RESTORE_DEBUG=1"

run 4800 "bf16 serving SEED via bulk_to_host (writes flat sidecar; d2h phase breakdown)" /tmp/b28_seed.log \
  $NP $BF AMODAL_BENCH_HEURISTICS=1 python bench.py

run 3600 "COMPOSED bf16 warm start from FLAT sidecar (target <150 s; phase breakdown)" /tmp/b28_composed.log \
  $NP $BF AMODAL_BENCH_HEURISTICS=1 python bench.py

run 3600 "f32 load via flat sidecar? no — Orbax fallback control (old ckpt, no sidecar)" /tmp/b28_f32ctl.log \
  $NP AMODAL_HEUR_SERVING=/tmp/heur_serving_tpu AMODAL_RESTORE_DEBUG=1 AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
