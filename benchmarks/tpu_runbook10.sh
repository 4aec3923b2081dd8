#!/bin/bash
# Runbook v10 (round 3): finish the flagship quality-gate ladder that
# runbook v9 queued but the session host recycled after its first row
# (only "tome base 19,2560" landed — FAIL 0.537). Remaining candidates,
# most-likely-to-PASS first, so the fastest PASSING operating point is
# known as early as possible:
#   1. int8 calib chain (3.73 img/s) — round-2 proxies suggested int8's
#      delta is an order below ToMe's.
#   2. tome base 9,2560 (4.26 img/s) — the headline single-knob ToMe.
#   3. int8 + tome9 stack (5.1 img/s).
#   4. tome base 9,1280 — HALF the merge: does a gentler r pass?
#   5. exact b16/tile8 under the promoted q_split default — candidate
#      new exact best (b16/tile8 measured 3.123 pre-q_split).
# Every run is probe-gated (tunnel can die for hours) and commits its
# raw log row immediately.
cd /root/repo
echo $$ > /tmp/runbook10.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook10.log; }
log "runbook v10 start"

probe() {
  # 300s, not 90: on this 1-vCPU box a concurrent pytest/compile makes the
  # bare jax import take minutes, and a 90s probe then misreads CPU
  # contention as a tunnel outage (first v10 launch did exactly that).
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
  git add $OUT && git commit -q -m "runbook v10: record '$title'"
}

run 3600 "quality gate: int8 calib chain base+amodal+head (the 3.73 img/s point)" /tmp/b10_int8.log \
  AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 python bench.py
run 2400 "quality gate: tome base 9,2560 (the 4.26 img/s point)" /tmp/b10_tome9.log \
  AMODAL_QUALITY=1 AMODAL_TOME_BASE=9,2560 python bench.py
run 3600 "quality gate: int8 chain + tome base 9,2560 (the 5.1 img/s stack)" /tmp/b10_int8_tome.log \
  AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 AMODAL_TOME_BASE=9,2560 python bench.py
run 2400 "quality gate: tome base 9,1280 (half-r gentler merge)" /tmp/b10_tome_half.log \
  AMODAL_QUALITY=1 AMODAL_TOME_BASE=9,1280 python bench.py
run 2400 "exact b16/tile8 under q_split default (candidate exact best)" /tmp/b10_b16.log \
  AMODAL_BENCH_BATCH=16 AMODAL_HEAD_TILE=8 python bench.py
log "runbook v10 done"
