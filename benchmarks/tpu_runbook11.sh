#!/bin/bash
# Runbook v11 (round 3): retry the tome 9,2560 gate row — its v10 run
# aborted on bench.py's old fixed 300 s probe during a degraded-tunnel
# phase (the deadline is now 600 s default / env-overridable). Chains
# behind runbook v10's pid.
cd /root/repo
echo $$ > /tmp/runbook11.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook11.log; }
log "runbook v11 start"

while kill -0 "$(cat /tmp/runbook10.pid 2>/dev/null)" 2>/dev/null; do
  log "waiting for runbook10"; sleep 120
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
  git add $OUT && git commit -q -m "runbook v11: record '$title'"
}

run 2400 "quality gate: tome base 9,2560 (the 4.26 img/s point, probe-abort retry)" /tmp/b11_tome9.log \
  AMODAL_QUALITY=1 AMODAL_TOME_BASE=9,2560 python bench.py
log "runbook v11 done"
