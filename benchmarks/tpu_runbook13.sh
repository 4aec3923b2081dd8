#!/bin/bash
# Runbook v13 (round 3): map the GATED int8 frontier. v12 found the first
# flagship operating point that passes the proxy quality gate (int8 base
# trunk only: 3.408 img/s, delta 0.027/0.0032, PASS). Walk outward from
# it: both trunks (no head), and base-only with calibrated act scales —
# find the fastest point that still passes. Chains behind runbook12 via done-marker.
cd /root/repo
echo $$ > /tmp/runbook13.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook13.log; }
log "runbook v13 start"

# Chain on runbook12's done-marker, not PID liveness: a stale pid file
# whose PID got reused would stall forever, and a missing file would
# start early (advisor r3 finding).
while [ -f /tmp/runbook12.pid ] && [ ! -f /tmp/runbook12.done ]; do
  log "waiting for runbook12"; sleep 120
done

probe() {
  while true; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
    if [ $? -eq 0 ]; then log "tunnel UP"; return; fi
    log "tunnel still down"
    sleep 180
  done
}

OUT=benchmarks/RESULTS_r03_tpu.md
run() {  # run <timeout_s> <title> <logfile> [ENV=V ...] cmd...
  local to="$1" title="$2" lf="$3"; shift 3
  probe
  log "$title"
  timeout "$to" env "$@" > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; grep -E '"metric"|Ran out of memory' "$lf" | tail -3; [ $rc -ne 0 ] && grep -vE '"metric"|Ran out' "$lf" | tail -3; echo '```'; } >> $OUT
  git add $OUT && git commit -q -m "runbook v13: record '$title'"
}

run 2400 "quality gate: int8 both trunks no head (gated frontier walk)" /tmp/b13_int8ba.log \
  AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 python bench.py
run 2400 "quality gate: int8 base only + calib scales (gated frontier walk)" /tmp/b13_int8bc.log \
  AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_CALIB=1 python bench.py
log "runbook v13 done"
