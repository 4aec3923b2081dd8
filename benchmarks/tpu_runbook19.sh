#!/bin/bash
# Runbook v19 (round 4): third warm-start measurement. The v18 WARM v2
# row read 690 s first-pixel with param_init 555 s — measured right
# after a tunnel-down window (the degraded-up tunnel state CLAUDE.md
# documents: 95 s first-op roundtrips), so it says nothing about the
# cache. v18's run DID seed the init programs (threshold 2 s); this row
# re-measures on a probe-confirmed-healthy tunnel for the clean number.
cd /root/repo
echo $$ > /tmp/runbook19.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook19.log; }
log "runbook v19 start"
while [ -f /tmp/runbook18.pid ] && [ ! -f /tmp/runbook18.done ]; do
  log "waiting for runbook18"; sleep 120
done
probe() {
  # require TWO consecutive fast probes (<60 s) so a degraded-up tunnel
  # doesn't poison the warm-start wall measurement
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
  git add $OUT && git commit -q -m "runbook v19: record '$title'"
}
NP="AMODAL_BENCH_NO_PROBE=1 AMODAL_TPU_CACHE=1"
run 2400 "heuristics p2g demo WARM v3 (healthy-tunnel gate, init cache seeded)" /tmp/b19_heur_warm3.log \
  $NP AMODAL_BENCH_HEURISTICS=1 python bench.py
log "runbook v19 done"
touch /tmp/runbook19.done
