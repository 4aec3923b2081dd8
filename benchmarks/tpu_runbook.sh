#!/bin/bash
# Probe the TPU tunnel until it answers, then run the queued measurements.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook.log; }
log "runbook start"
while true; do
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
  if [ $? -eq 0 ]; then log "tunnel UP"; break; fi
  log "tunnel still down"
  sleep 180
done

log "1/5 vae stage profile"
timeout 3000 python benchmarks/vae_stage_profile.py > /tmp/vae_profile.log 2>&1
log "vae profile rc=$?"

log "2/5 upsample A/B"
timeout 3000 python benchmarks/upsample_ab.py > /tmp/upsample_ab.log 2>&1
log "upsample ab rc=$?"

log "3/5 bench depthfm (fused ups)"
AMODAL_BENCH_DEPTHFM=1 timeout 3000 python bench.py > /tmp/bench_dfm_fused.log 2>&1
log "bench depthfm rc=$?"

log "4/5 bench train depthfm (remat on)"
AMODAL_BENCH_TRAIN=depthfm timeout 3000 python bench.py > /tmp/bench_train_dfm.log 2>&1
log "bench train depthfm rc=$?"

log "5/5 default bench (flagship, regression check)"
timeout 3000 python bench.py > /tmp/bench_default.log 2>&1
log "default bench rc=$?"
log "runbook done"
