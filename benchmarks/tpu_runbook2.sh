#!/bin/bash
# Phase-2 TPU measurement queue: training batch-scaling + remat A/B.
# Waits for the phase-1 runbook (pid file) to finish, runs serially,
# commits the raw logs (results survive session end).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook2.log; }
log "runbook phase 2 start"
if [ -f /tmp/runbook.pid ]; then
  while kill -0 "$(cat /tmp/runbook.pid)" 2>/dev/null; do sleep 60; done
fi
log "phase 1 done; probing tunnel"
while true; do
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
  if [ $? -eq 0 ]; then log "tunnel UP"; break; fi
  log "tunnel still down"
  sleep 180
done

OUT=benchmarks/RESULTS_r02_tpu_phase2.md
echo "# TPU measurements phase 2 (training scaling, $(date -u +%FT%TZ))" > $OUT
bench() {  # bench <title> <logfile> <envassign...>
  local title="$1" lf="$2"; shift 2
  log "$title"
  env "$@" timeout 3000 python bench.py > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; tail -3 "$lf"; echo '```'; } >> $OUT
}

# Discriminative train-step batch scaling (vitl@518, remat='attn' default).
bench "train vitl@518 b8 (baseline repro)"  /tmp/tr_b8.log  AMODAL_BENCH_TRAIN=1
bench "train vitl@518 b12"                  /tmp/tr_b12.log AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_BATCH=12
bench "train vitl@518 b16"                  /tmp/tr_b16.log AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_BATCH=16
# b16 under FULL remat in case attn-policy OOMs at b16.
bench "train vitl@518 b16 remat=full"       /tmp/tr_b16f.log AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_BATCH=16 AMODAL_BENCH_REMAT=full
# DepthFM train-step remat A/B (950M UNet; b4 @512).
bench "train depthfm b4 remat=0"            /tmp/tr_dfm_nr.log AMODAL_BENCH_TRAIN=depthfm AMODAL_BENCH_REMAT=0

git add $OUT && git commit -q -m "Record phase-2 TPU measurements (training batch scaling, remat A/B)" && log "results committed"
log "runbook phase 2 done"
