#!/bin/bash
# Phase-3 TPU queue: DepthFM train step (retry after the bwd-attention
# scoped-vmem fix) + the DeepCache serving ladder with quality deltas.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook3.log; }
log "runbook phase 3 start"
if [ -f /tmp/runbook2.pid ]; then
  while kill -0 "$(cat /tmp/runbook2.pid)" 2>/dev/null; do sleep 60; done
fi
log "phase 2 done; probing tunnel"
while true; do
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
  if [ $? -eq 0 ]; then log "tunnel UP"; break; fi
  log "tunnel still down"
  sleep 180
done

OUT=benchmarks/RESULTS_r02_tpu_phase3.md
echo "# TPU measurements phase 3 (DepthFM train retry + DeepCache ladder, $(date -u +%FT%TZ))" > $OUT
bench() {  # bench <title> <logfile> <envassign...>
  local title="$1" lf="$2"; shift 2
  log "$title"
  env "$@" timeout 3000 python bench.py > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; tail -3 "$lf"; echo '```'; } >> $OUT
}

bench "train depthfm b4 remat=1 (post vmem fix)" /tmp/p3_tr_dfm.log \
  AMODAL_BENCH_TRAIN=depthfm
bench "depthfm deepcache=2 (quality)" /tmp/p3_dc2.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 AMODAL_QUALITY=1
bench "depthfm deepcache=2,6 (quality)" /tmp/p3_dc26.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2,6 AMODAL_QUALITY=1
bench "depthfm deepcache=2 + tome=0.75 (quality)" /tmp/p3_dc_tome.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 AMODAL_TOME_DEPTHFM=0.75 AMODAL_QUALITY=1
bench "depthfm deepcache=2 + int8 (quality)" /tmp/p3_dc_int8.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 AMODAL_INT8_DEPTHFM=1 AMODAL_QUALITY=1

git add $OUT && git commit -q -m "Record phase-3 TPU measurements (DepthFM train post-fix, DeepCache ladder)" && log "results committed"
log "runbook phase 3 done"
