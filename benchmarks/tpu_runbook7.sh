#!/bin/bash
# Runbook v7 (round 3): probe-gated TPU measurement queue.
# VERDICT-r2 items: #2 p50-method verification, #5 q_split promotion
# regression, #9 trainer stress (vitg + grad-accum), #10 calib wall time
# (cold with the new persistent TPU compile cache, then warm), plus the
# two round-2 leftovers the tunnel flap dropped (p2g wo+deepcache stack,
# depthfm wo b1) and a quality-gated max-stack row.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook7.log; }
log "runbook v7 start"

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
  { echo; echo "## $title (rc=$rc)"; echo '```'; tail -6 "$lf"; echo '```'; } >> $OUT
  git add $OUT && git commit -q -m "runbook v7: record '$title'"
}

# 1-2: the two driver-headline regressions (clean path, no cache)
run 3000 "default flagship bench (q_split=2 promoted, amortized p50)" /tmp/b7_default.log \
  python bench.py
run 3000 "train step vitl@518 b8 (q_split default regression)" /tmp/b7_train_vitl.log \
  AMODAL_BENCH_TRAIN=1 python bench.py

# 3-5: trainer stress rows (VERDICT #9)
run 3000 "train step vitg@518 b8 remat=attn (stress row)" /tmp/b7_train_vitg.log \
  AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg python bench.py
run 3000 "train step vitg@518 b8 remat=full" /tmp/b7_train_vitg_full.log \
  AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg AMODAL_BENCH_REMAT=full python bench.py
run 3000 "train step vitg@518 b4 remat=attn (OOM fallback row)" /tmp/b7_train_vitg_b4.log \
  AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg AMODAL_BENCH_BATCH=4 python bench.py
run 3000 "train step vitl@518 b8 accum=4 (eff_bs 32, reference regime)" /tmp/b7_train_accum.log \
  AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ACCUM=4 python bench.py

# 6-7: calibrated-int8 wall time, cold (seeds the TPU compile cache) then
# warm (VERDICT #10: goal < 15 min documented)
run 5400 "int8 calib chain COLD + TPU compile cache seed (calib_wall_s)" /tmp/b7_calib_cold.log \
  AMODAL_TPU_CACHE=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 python bench.py
run 3000 "int8 calib chain WARM (persistent-cache hit, calib_wall_s)" /tmp/b7_calib_warm.log \
  AMODAL_TPU_CACHE=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 python bench.py

# 8-9: round-2 leftovers the tunnel flap dropped
run 3000 "p2g heuristics int8=wo + deepcache5 stack" /tmp/b7_p2g_wo_dc.log \
  AMODAL_BENCH_HEURISTICS=1 AMODAL_INT8_P2G=1 AMODAL_DEEPCACHE_P2G=5 AMODAL_QUALITY=1 python bench.py
run 3000 "depthfm int8=wo b1 latency" /tmp/b7_dfm_wo_b1.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=wo AMODAL_BENCH_BATCH=1 python bench.py

# 10: the recommended max stack WITH its gate verdict on the record
run 5400 "max stack (int8 calib+head + tome both trunks) + quality gate" /tmp/b7_maxstack_q.log \
  AMODAL_TPU_CACHE=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_HEAD=1 \
  AMODAL_TOME_BASE=4,2560 AMODAL_TOME_AMODAL=4,2560 AMODAL_QUALITY=1 python bench.py
log "runbook v7 done"
