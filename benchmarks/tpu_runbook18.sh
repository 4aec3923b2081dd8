#!/bin/bash
# Runbook v18 (round 4): final warm-start demonstration. v16 measured
# WARM first-pixel 294.6 s (vs 1568 s r3 cold) with sam 26 s + p2g 32 s
# compile remnants; the startup breakdown instrumentation (bench.py)
# attributes most of the rest to param-INIT programs, which the cache
# now persists (min compile 2 s, lowered from 10). v17's heuristics
# rows run first and seed those programs; this row then measures the
# true warm floor — target <180 s (VERDICT r3 #5).
cd /root/repo
echo $$ > /tmp/runbook18.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook18.log; }
log "runbook v18 start"
while [ -f /tmp/runbook17.pid ] && [ ! -f /tmp/runbook17.done ]; do
  log "waiting for runbook17"; sleep 120
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
  git add $OUT && git commit -q -m "runbook v18: record '$title'"
}
NP="AMODAL_BENCH_NO_PROBE=1 AMODAL_TPU_CACHE=1"
run 2400 "heuristics p2g demo WARM v2 (init programs cached, startup breakdown)" /tmp/b18_heur_warm2.log \
  $NP AMODAL_BENCH_HEURISTICS=1 python bench.py
# exact-path regression check after the round's code churn (default
# env: the driver's bench-of-record path)
run 3600 "default exact flagship regression (post r4 churn)" /tmp/b18_exact.log \
  $NP python bench.py
log "runbook v18 done"
touch /tmp/runbook18.done
