#!/bin/bash
# Runbook v9 (round 3): quality-GATE the flagship serving ladder
# (VERDICT-r2 #7 completion). Every parity-breaking operating point gets
# its blended-depth delta vs the exact pipeline measured IN THE SAME RUN
# (AMODAL_QUALITY=1, gate max_abs 0.05 / mean_abs 0.01,
# pipeline/quality.py) so ROADMAP's recommendation table can be
# annotated pass/fail and the recommended stack is the fastest PASSING
# one — the max stack (both trunks merged at layer 4) already measured
# FAIL (blended_max 0.596, runbook v7). Candidates, cheap->expensive:
# later-merge ToMe (taps before the merge keep the full stream), the
# int8 calib chain, and the int8+ToMe stack.
# Waits for runbook v8's pid to exit before touching the TPU.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook9.log; }
log "runbook v9 start"

while kill -0 "$(cat /tmp/runbook8.pid 2>/dev/null)" 2>/dev/null; do
  log "waiting for runbook8"; sleep 120
done

probe() {
  while true; do
    timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
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
  git add $OUT && git commit -q -m "runbook v9: record '$title'"
}

run 2400 "quality gate: tome base 19,2560 (late merge, 2/4 taps full-stream)" /tmp/b9_tome19.log \
  AMODAL_QUALITY=1 AMODAL_TOME_BASE=19,2560 python bench.py
run 2400 "quality gate: tome base 9,2560 (the 4.26 img/s point)" /tmp/b9_tome9.log \
  AMODAL_QUALITY=1 AMODAL_TOME_BASE=9,2560 python bench.py
run 3600 "quality gate: int8 calib chain base+amodal+head (the 3.73 img/s point)" /tmp/b9_int8.log \
  AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 python bench.py
run 3600 "quality gate: int8 chain + tome base 9,2560 (the 5.1 img/s stack)" /tmp/b9_int8_tome.log \
  AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 AMODAL_TOME_BASE=9,2560 python bench.py
run 3600 "quality gate: int8 chain + tome base 19 + amodal 11 (late-merge stack)" /tmp/b9_int8_tome_late.log \
  AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 AMODAL_TOME_BASE=19,2560 AMODAL_TOME_AMODAL=11,2560 python bench.py
log "runbook v9 done"
