#!/bin/bash
# Runbook v22 (round 5): the three environment-shaped fixes from the
# round-4 verdict, measured on the real chip.
#  1. Bench-of-record resilience: bench.py's new probe WINDOW must ride
#     out an outage and still print a number — rehearsed with
#     FORCE_FAIL_S=240 (every probe inside the first 4 min is treated
#     as down). Doubles as the r5 exact-path regression row (expect
#     ~3.16 img/s ± tunnel noise).
#  2. Direction-resolved tunnel transfer rates: is the 305 s
#     load_serving wall per-leaf dispatch latency (fixable by chunking)
#     or a bandwidth floor? d2h / h2d-bulk / h2d-per-leaf /
#     bulk_to_device back-to-back in one session.
#  3. load_serving with the new eager BULK restore (serving_ckpt.py
#     bulk_to_device, default on): param_init should absorb the
#     transfer at the bulk rate and sam_first should drop from ~305 s
#     to compile-cache-hit time.
cd /root/repo
RUNBOOK=v22; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
NP="AMODAL_BENCH_NO_PROBE=1"

run 4800 "bench of record: recovery through forced-late probe (FORCE_FAIL_S=240, warm cache) = r5 exact regression row" /tmp/b22_recovery.log \
  AMODAL_BENCH_PROBE_FORCE_FAIL_S=240 python bench.py

run 2400 "tunnel transfer rates: d2h / h2d bulk / h2d per-leaf / bulk_to_device" /tmp/b22_transfer.log \
  $NP python benchmarks/transfer_probe.py

run 3600 "heuristics load_serving with BULK restore (5.8GB f32 stack, compile cache warm)" /tmp/b22_load_bulk.log \
  $NP AMODAL_HEUR_SERVING=/tmp/heur_serving_tpu AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
