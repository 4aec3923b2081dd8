#!/bin/bash
# Runbook v35 (round 5): restore-path A/B — device split programs vs
# AMODAL_FLAT_SPLIT=host (batched per-leaf device_put of zero-copy host
# views). v30 row B attributed the 148.1 s min-bytes restore to split-
# PROGRAM cost (124.7 s warm reload of two giant executables; bytes are
# only 23 s). The host mode pays no compile and no executable reload —
# if the batched puts pipeline near the bulk link rate, restore drops
# toward the ~30-50 s byte floor. Same session, same sidecar
# (/tmp/heur_serving_min seeded by v30), back-to-back.
cd /root/repo
RUNBOOK=v35; OUT=benchmarks/RESULTS_r05_tpu.md
source benchmarks/runbook_lib.sh
rb_start
wait_for v34
NP="AMODAL_BENCH_NO_PROBE=1"
ST="AMODAL_HEUR_DTYPE=bfloat16 AMODAL_INT8_P2G=1 AMODAL_INT8_SAM=1 AMODAL_DEEPCACHE_P2G=5 AMODAL_HEUR_SERVING=/tmp/heur_serving_min AMODAL_RESTORE_DEBUG=1"

run 3600 "restore A/B control: device split programs (v30 row B repro, 148.1 s)" /tmp/b35_device.log \
  $NP $ST AMODAL_BENCH_HEURISTICS=1 python bench.py

run 3600 "restore A/B: FLAT_SPLIT=host batched per-leaf device_put (no split programs)" /tmp/b35_host.log \
  $NP $ST AMODAL_FLAT_SPLIT=host AMODAL_BENCH_HEURISTICS=1 python bench.py

run 3600 "restore A/B: FLAT_SPLIT=host repeat (steady state)" /tmp/b35_host2.log \
  $NP $ST AMODAL_FLAT_SPLIT=host AMODAL_BENCH_HEURISTICS=1 python bench.py

runbook_done
