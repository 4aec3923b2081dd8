#!/bin/bash
# Runbook v33 (round 5): the f32 restore story, redone on a fresh host
# (v31 never ran — the host reset wiped its pre-seeded /tmp ckpt).
# Row 1 seeds the full-precision heuristics stack (writes Orbax AND the
# flat sidecar). Row 2 restores via the flat sidecar — the f32 floor
# (expected transfer-bound: ~7 GB at the ~30 MB/s tunnel rate). Row 3
# moves the sidecars aside and restores through the Orbax fallback —
# the control that proves d003b75's hard per-group sync bounds memory
# (v28's fallback control OOMed via async over-allocation, rc=1).
cd /root/repo
RUNBOOK=v33; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v30
NP="AMODAL_BENCH_NO_PROBE=1"
SD=/tmp/heur_serving_f32

run 7200 "f32 serving SEED (Orbax + flat sidecar; d2h phase breakdown)" /tmp/b33_seed.log \
  $NP AMODAL_HEUR_SERVING=$SD AMODAL_RESTORE_DEBUG=1 AMODAL_BENCH_HEURISTICS=1 python bench.py

run 4800 "f32 load_serving via FLAT sidecar (the f32 restore floor)" /tmp/b33_flat.log \
  $NP AMODAL_HEUR_SERVING=$SD AMODAL_RESTORE_DEBUG=1 AMODAL_BENCH_HEURISTICS=1 python bench.py

# force the Orbax fallback: hide the sidecar plan (serving state is one
# dir: <SD>/flat/plan.json + <SD>/params Orbax tree)
mv "$SD/flat/plan.json" "$SD/flat/plan.json.off"
log "sidecar plan hidden -> Orbax fallback"

run 4800 "f32 Orbax-fallback restore control (per-group sync fix; v28 OOMed)" /tmp/b33_orbax.log \
  $NP AMODAL_HEUR_SERVING=$SD AMODAL_RESTORE_DEBUG=1 AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
