# Shared runbook helpers — source this from benchmarks/tpu_runbookNN.sh:
#
#   cd /root/repo
#   RUNBOOK=v21; OUT=benchmarks/RESULTS_r04_tpu.md
#   source benchmarks/runbook_lib.sh
#   wait_for runbook20   # optional chaining on the previous runbook
#   run 2400 "row title" /tmp/row.log ENV=V ... python bench.py
#
# The probe gate is LOAD-BEARING for measurement validity (CLAUDE.md):
# a degraded-up tunnel (95-418 s first-op roundtrips) poisons wall-time
# numbers — `probe` requires TWO consecutive <60 s roundtrips before a
# row may run. Tune it HERE so every runbook shares one methodology.
#
# (v2-v20 carried private copies of probe/run; those scripts are
# historical records of what ran and stay untouched — new runbooks
# source this file.)

log() { echo "[$(date +%H:%M:%S)] $*" >> "/tmp/runbook${RUNBOOK}.log"; }

wait_for() {  # wait_for runbook19  — blocks until that runbook's done
  while [ -f "/tmp/$1.pid" ] && [ ! -f "/tmp/$1.done" ]; do
    log "waiting for $1"; sleep 120
  done
}

probe() {
  local fast=0
  while [ "$fast" -lt 2 ]; do
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

run() {  # run <timeout_s> <title> <logfile> [ENV=V ...] cmd...
  local to="$1" title="$2" lf="$3"; shift 3
  probe
  log "$title"
  timeout "$to" env "$@" > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'
    grep -E '"metric"|Ran out of memory' "$lf" | tail -3
    [ $rc -ne 0 ] && grep -vE '"metric"|Ran out' "$lf" | tail -3
    echo '```'; } >> "$OUT"
  git add "$OUT" && git commit -q -m "runbook ${RUNBOOK}: record '$title'"
}

runbook_done() {
  log "runbook ${RUNBOOK} done"
  touch "/tmp/runbook${RUNBOOK}.done"
}
