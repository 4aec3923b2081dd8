#!/bin/bash
# Runbook v36 (round 5): FULL-f32 restore under the new host-split
# default. v33 measured f32 flat restore at 507.9 s (110.8 s of bytes +
# 397 s of cold split programs); host mode removes the programs, so the
# 7 GB stack should land near its byte floor (~120-180 s at the
# measured 40-63 MB/s) — potentially beating the 179.4 s random-init
# headline WITHOUT any precision/quantization tricks. Two runs for a
# repeat band. The v33 fallback control hid the sidecar plan; restore
# it first.
cd /root/repo
RUNBOOK=v36; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v35
NP="AMODAL_BENCH_NO_PROBE=1"
SD=/tmp/heur_serving_f32
[ -f "$SD/flat/plan.json.off" ] && mv "$SD/flat/plan.json.off" "$SD/flat/plan.json"

run 3600 "f32 restore, host-split default (vs 507.9 s device / 179.4 s init)" /tmp/b36_f32hostA.log \
  $NP AMODAL_HEUR_SERVING=$SD AMODAL_RESTORE_DEBUG=1 AMODAL_BENCH_HEURISTICS=1 python bench.py

run 3600 "f32 restore, host-split repeat (band)" /tmp/b36_f32hostB.log \
  $NP AMODAL_HEUR_SERVING=$SD AMODAL_RESTORE_DEBUG=1 AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
