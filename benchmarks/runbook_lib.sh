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

# /tmp marker naming is NORMALIZED to runbook<NN> (no "v"): v21 wrote
# runbookv21.* while every earlier runbook and wait_for used runbookNN,
# so a "wait_for runbook21" would never see the pid file and two
# runbooks could benchmark concurrently on one TPU (advisor r4).
# rb_name strips an optional leading v; runbook scripts should use
# rb_start (writes the pid file) instead of hand-writing the path.
rb_name() { echo "runbook${1#v}"; }
_RB="$(rb_name "${RUNBOOK}")"

log() { echo "[$(date +%H:%M:%S)] $*" >> "/tmp/${_RB}.log"; }

rb_start() { echo $$ > "/tmp/${_RB}.pid"; log "runbook ${RUNBOOK} start"; }

wait_for() {  # wait_for runbook19 | wait_for v21 — blocks until done
  local n; n="$(rb_name "${1#runbook}")"
  while [ -f "/tmp/$n.pid" ] && [ ! -f "/tmp/$n.done" ]; do
    log "waiting for $n"; sleep 120
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
  touch "/tmp/${_RB}.done"
}
