#!/bin/bash
# Runbook v8 (round 3): vitg single-chip train rows via memory-efficient
# optimizers (VERDICT-r2 #9 completion — the Adam rows all OOM at
# 23.2-24.5G/15.75G, see RESULTS_r03; adafactor collapses the optimizer
# state so the 1.1B-param step can fit one 16G chip), plus an
# adam-bf16mu vitl regression row to show the cheap knob is neutral.
# Waits for runbook v7's pid to exit before touching the TPU.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook8.log; }
log "runbook v8 start"

while kill -0 "$(cat /tmp/runbook7.pid 2>/dev/null)" 2>/dev/null; do
  log "waiting for runbook7"; sleep 120
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
  git add $OUT && git commit -q -m "runbook v8: record '$title'"
}

run 3000 "train step vitg@518 b4 remat=attn opt=adafactor (single-chip fit)" /tmp/b8_vitg_af_b4.log \
  AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg AMODAL_BENCH_BATCH=4 AMODAL_BENCH_OPT=adafactor python bench.py
run 3000 "train step vitg@518 b8 remat=attn opt=adafactor" /tmp/b8_vitg_af_b8.log \
  AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg AMODAL_BENCH_OPT=adafactor python bench.py
run 3000 "train step vitl@518 b8 opt=adam-bf16mu (regression: knob neutral on speed)" /tmp/b8_vitl_bf16mu.log \
  AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_OPT=adam-bf16mu python bench.py
log "runbook v8 done"
