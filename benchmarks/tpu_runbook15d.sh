#!/bin/bash
# Runbook v15d: vitg b8 head-tile tuning. tile=2 FITS (1845 ms, 4.34
# img/s — the r3 595 MB OOM is gone) but b4 no-tile still wins
# throughput (4.78); tile=4 halves the head serialization at double the
# head activation peak — probe whether it fits and beats b4.
cd /root/repo
echo $$ > /tmp/runbook15d.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook15d.log; }
log "runbook v15d start"
while [ -f /tmp/runbook15c.pid ] && [ ! -f /tmp/runbook15c.done ]; do
  log "waiting for runbook15c"; sleep 120
done
probe() {
  while true; do
    timeout 420 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
    if [ $? -eq 0 ]; then log "tunnel UP"; return; fi
    log "tunnel still down"; sleep 180
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
  git add $OUT && git commit -q -m "runbook v15d: record '$title'"
}
NP="AMODAL_BENCH_NO_PROBE=1 AMODAL_TPU_CACHE=1"
run 2400 "train step vitg@518 b8 adafactor head-tile=4" /tmp/b15d_vitg4.log \
  $NP AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg \
  AMODAL_BENCH_OPT=adafactor AMODAL_BENCH_BATCH=8 AMODAL_BENCH_HEAD_TILE=4 python bench.py
run 2400 "train step vitg@518 b12 adafactor head-tile=2 (push the new ceiling)" /tmp/b15d_vitg12.log \
  $NP AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg \
  AMODAL_BENCH_OPT=adafactor AMODAL_BENCH_BATCH=12 AMODAL_BENCH_HEAD_TILE=2 python bench.py
log "runbook v15d done"
touch /tmp/runbook15d.done
