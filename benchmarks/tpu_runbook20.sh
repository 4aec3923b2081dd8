#!/bin/bash
# Runbook v20 (round 4): heuristics warm start FROM the serving
# checkpoint. v19 closed the target at 179.4 s with ~140 s of that
# being on-device random-weight INIT dispatch; MaskHeuristics now has
# save_serving/load_serving, and AMODAL_HEUR_SERVING seeds the ckpt on
# the first run then restores on the next — the restore path has no
# init programs at all. Both rows behind the healthy-tunnel double
# probe (a degraded tunnel poisons wall-time numbers, v18 lesson).
cd /root/repo
echo $$ > /tmp/runbook20.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook20.log; }
log "runbook v20 start"
while [ -f /tmp/runbook19.pid ] && [ ! -f /tmp/runbook19.done ]; do
  log "waiting for runbook19"; sleep 120
done
probe() {
  local fast=0
  while [ $fast -lt 2 ]; do
    local t0=$(date +%s)
    timeout 420 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
    local rc=$? t1=$(date +%s)
    if [ $rc -eq 0 ] && [ $((t1 - t0)) -lt 60 ]; then
      fast=$((fast + 1)); log "fast probe $fast/2 ($((t1 - t0))s)"
    else
      fast=0; log "tunnel down/degraded (rc=$rc $((t1 - t0))s)"; sleep 180
    fi
  done
}
OUT=benchmarks/RESULTS_r04_tpu.md
run() {
  local to="$1" title="$2" lf="$3"; shift 3
  probe
  log "$title"
  timeout "$to" env "$@" > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; grep -E '"metric"|Ran out of memory' "$lf" | tail -3; [ $rc -ne 0 ] && grep -vE '"metric"|Ran out' "$lf" | tail -3; echo '```'; } >> $OUT
  git add $OUT && git commit -q -m "runbook v20: record '$title'"
}
NP="AMODAL_BENCH_NO_PROBE=1 AMODAL_TPU_CACHE=1"
SC="AMODAL_HEUR_SERVING=/tmp/heur_serving_tpu"
run 2400 "heuristics warm start: SEED serving ckpt (init_random + save)" /tmp/b20_seed.log \
  $NP $SC AMODAL_BENCH_HEURISTICS=1 python bench.py
run 2400 "heuristics warm start: load_serving (no init programs)" /tmp/b20_load.log \
  $NP $SC AMODAL_BENCH_HEURISTICS=1 python bench.py
log "runbook v20 done"
touch /tmp/runbook20.done
