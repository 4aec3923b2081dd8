#!/bin/bash
# Runbook v15c (round 4): trained-proxy verdicts AT SERVING SCALE.
# The CPU proxy-v2 ladder (benchmarks/proxy_gate_v2_r04.json) showed the
# random-weight proxy overstates calibrated-int8 error and understates
# late-gentle ToMe; these rows re-measure the disagreeing knobs on the
# REAL TPU at 1022 px / 5330 tokens with the trained vitp pair
# (AMODAL_PROXY_CKPT), the closest pre-checkpoint evidence available.
cd /root/repo
echo $$ > /tmp/runbook15c.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook15c.log; }
log "runbook v15c start"

while [ -f /tmp/runbook15b.pid ] && [ ! -f /tmp/runbook15b.done ]; do
  log "waiting for runbook15b"; sleep 120
done

probe() {
  while true; do
    timeout 420 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
    if [ $? -eq 0 ]; then log "tunnel UP"; return; fi
    log "tunnel still down"
    sleep 180
  done
}

OUT=benchmarks/RESULTS_r04_tpu.md
run() {  # run <timeout_s> <title> <logfile> [ENV=V ...] cmd...
  local to="$1" title="$2" lf="$3"; shift 3
  probe
  log "$title"
  timeout "$to" env "$@" > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; grep -E '"metric"|Ran out of memory' "$lf" | tail -3; [ $rc -ne 0 ] && grep -vE '"metric"|Ran out' "$lf" | tail -3; echo '```'; } >> $OUT
  git add $OUT && git commit -q -m "runbook v15c: record '$title'"
}

NP="AMODAL_BENCH_NO_PROBE=1 AMODAL_TPU_CACHE=1"
PX="AMODAL_PROXY_CKPT=checkpoints/proxy"
# (1) trained proxy, int8 calib chain at serving scale (the knob the two
# proxies disagree on hardest: random 0.129 FAIL vs trained-CPU 0.011 PASS)
run 3600 "trained-proxy@1022: int8 calib chain (base+amodal+head)" /tmp/b15c_calib.log \
  $NP $PX AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 python bench.py
# (2) trained proxy, late gentle ToMe (trained-CPU PASS 0.022 vs random FAIL 0.16)
run 3600 "trained-proxy@1022: tome base 9,1280 (late gentle merge)" /tmp/b15c_tome.log \
  $NP $PX AMODAL_QUALITY=1 AMODAL_TOME_BASE=9,1280 python bench.py
# (3) trained proxy, calib + late-gentle stack (both-PASS candidates stacked)
run 3600 "trained-proxy@1022: int8 calib + tome base 9,1280 stack" /tmp/b15c_stack.log \
  $NP $PX AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 AMODAL_TOME_BASE=9,1280 python bench.py
log "runbook v15c done"
touch /tmp/runbook15c.done
