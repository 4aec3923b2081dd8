#!/bin/bash
# Probe the TPU tunnel until it answers, then run the queued measurements
# and COMMIT the raw logs (so results survive even if the session ended).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook.log; }
log "runbook v2 start"
while true; do
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
  if [ $? -eq 0 ]; then log "tunnel UP"; break; fi
  log "tunnel still down"
  sleep 180
done

OUT=benchmarks/RESULTS_r02_tpu.md
echo "# TPU measurements (runbook, $(date -u +%FT%TZ))" > $OUT
run() {  # run <title> <logfile> <cmd...>
  local title="$1" lf="$2"; shift 2
  log "$title"
  timeout 3000 "$@" > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; grep -v "SIGILL\|cpu_aot_loader" "$lf" | tail -40; echo '```'; } >> $OUT
}

run "vae stage profile (unfused baseline N/A - fused default)" /tmp/vae_profile.log python benchmarks/vae_stage_profile.py
run "upsample A/B (old vs fused + full vae_decode)" /tmp/upsample_ab.log python benchmarks/upsample_ab.py
log "bench depthfm"
AMODAL_BENCH_DEPTHFM=1 timeout 3000 python bench.py > /tmp/bench_dfm_fused.log 2>&1
log "bench depthfm rc=$?"
{ echo; echo "## bench depthfm (fused ups)"; echo '```'; tail -3 /tmp/bench_dfm_fused.log; echo '```'; } >> $OUT
log "bench train depthfm"
AMODAL_BENCH_TRAIN=depthfm timeout 3000 python bench.py > /tmp/bench_train_dfm.log 2>&1
log "bench train depthfm rc=$?"
{ echo; echo "## bench train depthfm (remat on)"; echo '```'; tail -3 /tmp/bench_train_dfm.log; echo '```'; } >> $OUT
log "default bench"
timeout 3000 python bench.py > /tmp/bench_default.log 2>&1
log "default bench rc=$?"
{ echo; echo "## default flagship bench"; echo '```'; tail -3 /tmp/bench_default.log; echo '```'; } >> $OUT

git add $OUT && git commit -q -m "Record TPU runbook measurements (post-outage)" && log "results committed"
log "runbook v2 done"
