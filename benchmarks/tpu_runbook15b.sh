#!/bin/bash
# Runbook v15b: retry any v15 row that produced no metric (the tunnel
# measured a 243 s first-op roundtrip this session — bench's own 600 s
# probe subprocess aborted rows the runbook's probe had just cleared).
# Rows here run with AMODAL_BENCH_NO_PROBE=1: the runbook probes
# immediately before each row, and the per-row `timeout` already bounds
# a wedged tunnel (rc=124 instead of a hang).
cd /root/repo
echo $$ > /tmp/runbook15b.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook15b.log; }
log "runbook v15b start"

while [ -f /tmp/runbook15.pid ] && [ ! -f /tmp/runbook15.done ]; do
  log "waiting for runbook15"; sleep 120
done

probe() {
  while true; do
    timeout 420 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
    if [ $? -eq 0 ]; then log "tunnel UP"; return; fi
    log "tunnel still down"
    sleep 180
  done
}

OUT=benchmarks/RESULTS_r04_tpu.md
run() {  # run <timeout_s> <title> <origlog> <logfile> [ENV=V ...] cmd...
  local to="$1" title="$2" orig="$3" lf="$4"; shift 4
  if [ -f "$orig" ] && grep -q '"metric"' "$orig"; then
    log "skip (already measured): $title"; return
  fi
  probe
  log "$title"
  timeout "$to" env "$@" > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; grep -E '"metric"|Ran out of memory' "$lf" | tail -3; [ $rc -ne 0 ] && grep -vE '"metric"|Ran out' "$lf" | tail -3; echo '```'; } >> $OUT
  git add $OUT && git commit -q -m "runbook v15b: record '$title'"
}

NP=AMODAL_BENCH_NO_PROBE=1
run 3600 "quality gate: int8 MIXED scales + smooth=0.5 full chain (retry)" /tmp/b15_mixed.log /tmp/b15b_mixed.log \
  $NP AMODAL_TPU_CACHE=1 AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_MIXED=1 \
  AMODAL_INT8_SMOOTH=0.5 python bench.py
run 3600 "quality gate: int8 calib chain margin=0.7 (outlier clip) (retry)" /tmp/b15_m07.log /tmp/b15b_m07.log \
  $NP AMODAL_TPU_CACHE=1 AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_MARGIN=0.7 python bench.py
run 2400 "train step vitg@518 b8 adafactor head-tile=2 (the 595MB shave) (retry)" /tmp/b15_vitg.log /tmp/b15b_vitg.log \
  $NP AMODAL_TPU_CACHE=1 AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg \
  AMODAL_BENCH_OPT=adafactor AMODAL_BENCH_BATCH=8 AMODAL_BENCH_HEAD_TILE=2 python bench.py
# fused A/B prints custom "ms" lines, not bench JSON — record verbatim
if [ -f /tmp/b15_fuse.log ] && grep -q " ms " /tmp/b15_fuse.log; then
  log "skip (already measured): fused epilogue A/B"
else
  probe
  log "fused epilogue A/B (retry)"
  timeout 2400 python benchmarks/fused_epilogue_ab.py > /tmp/b15b_fuse.log 2>&1
  rc=$?
  { echo; echo "## fused epilogue A/B (pallas vs xla) (rc=$rc)"; echo '```';
    grep -v WARNING /tmp/b15b_fuse.log | tail -20; echo '```'; } >> $OUT
  git add $OUT && git commit -q -m "runbook v15b: record 'fused epilogue A/B'"
fi
run 3600 "heuristics p2g demo COLD (seeding persistent cache) (retry)" /tmp/b15_heur_cold.log /tmp/b15b_heur_cold.log \
  $NP AMODAL_TPU_CACHE=1 AMODAL_BENCH_HEURISTICS=1 python bench.py
run 2400 "heuristics p2g demo WARM (persistent-cache hit, first-pixel wall) (retry)" /tmp/b15_heur_warm.log /tmp/b15b_heur_warm.log \
  $NP AMODAL_TPU_CACHE=1 AMODAL_BENCH_HEURISTICS=1 python bench.py
log "runbook v15b done"
touch /tmp/runbook15b.done
