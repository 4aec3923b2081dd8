#!/bin/bash
# Runbook v38 (round 5, final): the Orbax-fallback restore under the
# new direct-batch host path (bulk_to_device no longer concatenates on
# host — it batch-puts the Orbax leaves directly). v33's control paid
# 76.5 s orbax read + 176.3 s put + 152 s split-jit = 480.3 s; the new
# path should drop to read + one batched transfer (~250-290 s at the
# measured f32 drain rate). Same 7 GB f32 stack; the sidecar plan is
# hidden for the run and restored after.
cd /root/repo
RUNBOOK=v38; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v37
NP="AMODAL_BENCH_NO_PROBE=1"
SD=/tmp/heur_serving_f32
[ -f "$SD/flat/plan.json" ] && mv "$SD/flat/plan.json" "$SD/flat/plan.json.off"

run 3600 "f32 Orbax-fallback via direct-batch host puts (v33 control: 480.3 s)" /tmp/b38_orbax_host.log \
  $NP AMODAL_HEUR_SERVING=$SD AMODAL_RESTORE_DEBUG=1 AMODAL_BENCH_HEURISTICS=1 python bench.py

[ -f "$SD/flat/plan.json.off" ] && mv "$SD/flat/plan.json.off" "$SD/flat/plan.json"
runbook_done
