#!/bin/bash
# Runbook v6: probe-gated TPU measurement queue (single instance; replaces
# the flapped v5 run — the v5 default-bench regression already recorded
# 3.117 img/s exact). Each item re-probes via bench.py's built-in probe
# and the raw log is committed immediately, so a tunnel flap mid-queue
# loses only the current item.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook6.log; }
log "runbook v6 start"

probe() {
  while true; do
    timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
    if [ $? -eq 0 ]; then log "tunnel UP"; return; fi
    log "tunnel still down"
    sleep 180
  done
}

OUT=benchmarks/RESULTS_r02_tpu_phase5.md
run() {  # run <title> <logfile> [ENV=V ...] cmd...
  local title="$1" lf="$2"; shift 2
  probe
  log "$title"
  timeout 3000 env "$@" > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; tail -6 "$lf"; echo '```'; } >> $OUT
  git add $OUT && git commit -q -m "runbook v6: record '$title'"
}

run "depthfm int8=calib b8 throughput" /tmp/b6_dfm_calib.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=calib python bench.py
run "depthfm int8=calib b1 latency" /tmp/b6_dfm_calib_b1.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=calib AMODAL_BENCH_BATCH=1 python bench.py
run "attention q_split interleave A/B (kernel-level, back-to-back)" /tmp/b6_qsplit_ab.log \
  python benchmarks/attn_qsplit_ab.py
run "flagship bench with AMODAL_ATTN_QSPLIT=2 (exact)" /tmp/b6_qsplit_bench.log \
  AMODAL_ATTN_QSPLIT=2 python bench.py
run "p2g heuristics int8=wo (weight-only UNet, param-read-bound lever)" /tmp/b6_p2g_wo.log \
  AMODAL_BENCH_HEURISTICS=1 AMODAL_INT8_P2G=1 python bench.py
run "p2g heuristics int8=wo + deepcache5 stack" /tmp/b6_p2g_wo_dc.log \
  AMODAL_BENCH_HEURISTICS=1 AMODAL_INT8_P2G=1 AMODAL_DEEPCACHE_P2G=5 python bench.py
run "p2g int8=wo quality proxy (jittered weights)" /tmp/b6_p2g_wo_q.log \
  AMODAL_BENCH_HEURISTICS=1 AMODAL_INT8_P2G=1 AMODAL_QUALITY=1 python bench.py
run "depthfm int8=wo b8 throughput" /tmp/b6_dfm_wo.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=wo python bench.py
run "depthfm int8=wo b1 latency" /tmp/b6_dfm_wo_b1.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=wo AMODAL_BENCH_BATCH=1 python bench.py
run "depthfm deepcache2 + int8=calib stack" /tmp/b6_dfm_dc_calib.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 AMODAL_INT8_DEPTHFM=calib python bench.py
log "runbook v6 done"
