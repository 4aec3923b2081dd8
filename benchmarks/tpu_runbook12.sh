#!/bin/bash
# Runbook v12 (round 3, resumed session): finish the quality-gate table.
# Row 1 re-runs the v10 'tome base 9,1280' row lost to the tunnel outage;
# rows 2-3 hunt for a flagship operating point that PASSES the gate
# (max_abs<=0.05, mean_abs<=0.01 on the seeded-random proxy): int8 on the
# base trunk only (the full chain fails at 0.129), and a very-late gentle
# merge (layer 29 of 40 keeps 3/4 DPT taps on the full token stream).
cd /root/repo
echo $$ > /tmp/runbook12.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook12.log; }
log "runbook v12 start"

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
  git add $OUT && git commit -q -m "runbook v12: record '$title'"
}

run 2400 "quality gate: tome base 9,1280 (half-r gentler merge, outage retry)" /tmp/b12_tome9h.log \
  AMODAL_QUALITY=1 AMODAL_TOME_BASE=9,1280 python bench.py
run 2400 "quality gate: int8 base trunk only (gated-candidate hunt)" /tmp/b12_int8b.log \
  AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 python bench.py
run 2400 "quality gate: tome base 29,1280 (very late gentle merge, 3/4 taps full-stream)" /tmp/b12_tome29.log \
  AMODAL_QUALITY=1 AMODAL_TOME_BASE=29,1280 python bench.py
log "runbook v12 done"
touch /tmp/runbook12.done
