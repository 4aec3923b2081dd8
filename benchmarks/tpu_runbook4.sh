#!/bin/bash
# Phase-4 TPU queue: heuristics demo path after the batched-CFG change
# (exact; prior baseline 4.05 s/completion ran cond+uncond as separate
# UNet calls) + the DeepCache DDIM ladder with quality deltas.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook4.log; }
log "runbook phase 4 start"
if [ -f /tmp/runbook3.pid ]; then
  while kill -0 "$(cat /tmp/runbook3.pid)" 2>/dev/null; do sleep 60; done
fi
log "phase 3 done; probing tunnel"
while true; do
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
  if [ $? -eq 0 ]; then log "tunnel UP"; break; fi
  log "tunnel still down"
  sleep 180
done

OUT=benchmarks/RESULTS_r02_tpu_phase4.md
echo "# TPU measurements phase 4 (batched-CFG heuristics + DDIM DeepCache, $(date -u +%FT%TZ))" > $OUT
bench() {  # bench <title> <logfile> <envassign...>
  local title="$1" lf="$2"; shift 2
  log "$title"
  env "$@" timeout 3600 python bench.py > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; tail -3 "$lf"; echo '```'; } >> $OUT
}

bench "heuristics exact (batched CFG)" /tmp/p4_heur.log \
  AMODAL_BENCH_HEURISTICS=1
bench "heuristics deepcache=5 (quality)" /tmp/p4_heur_dc5.log \
  AMODAL_BENCH_HEURISTICS=1 AMODAL_DEEPCACHE_P2G=5 AMODAL_QUALITY=1
bench "heuristics deepcache=10 (quality)" /tmp/p4_heur_dc10.log \
  AMODAL_BENCH_HEURISTICS=1 AMODAL_DEEPCACHE_P2G=10 AMODAL_QUALITY=1

git add $OUT && git commit -q -m "Record phase-4 TPU measurements (batched-CFG heuristics, DDIM DeepCache)" && log "results committed"
log "runbook phase 4 done"
