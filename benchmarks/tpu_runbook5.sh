#!/bin/bash
# Runbook v5: probe the TPU tunnel until it answers, then run the queued
# phase-5 measurements and COMMIT the raw logs (survives session end).
#
# Queue rationale:
#   1. default bench      — flagship exact regression (BENCH_r02 headline)
#   2. depthfm int8=calib — commit 849603a landed static-scale calibration
#      (calibrate_diffusion_scales) but the session ended before any TPU
#      number: dynamic int8 was 15.1 img/s b8 but p50 260 ms at b1 (amax
#      reductions serialize); static scales should recover b1 latency.
#   3. depthfm int8=calib b1 — the p50 question above.
#   4. deepcache2 + int8=calib — the best-throughput stack re-tried with
#      static scales (dynamic stack was 16.69 img/s at p50 190).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook5.log; }
log "runbook v5 start"
while true; do
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
  if [ $? -eq 0 ]; then log "tunnel UP"; break; fi
  log "tunnel still down"
  sleep 180
done

OUT=benchmarks/RESULTS_r02_tpu_phase5.md
echo "# TPU measurements (runbook v5, $(date -u +%FT%TZ))" > $OUT
run() {  # run <title> <logfile> -- [ENV=V ...] cmd...
  local title="$1" lf="$2"; shift 2
  log "$title"
  timeout 3000 env "$@" > "$lf" 2>&1
  local rc=$?
  log "$title rc=$rc"
  { echo; echo "## $title (rc=$rc)"; echo '```'; tail -5 "$lf"; echo '```'; } >> $OUT
  git add $OUT && git commit -q -m "runbook v5: record '$title'"
}

run "default flagship bench (exact bf16)" /tmp/b5_default.log \
  python bench.py
run "depthfm int8=calib b8 throughput" /tmp/b5_dfm_calib.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=calib python bench.py
run "depthfm int8=calib b1 latency" /tmp/b5_dfm_calib_b1.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_INT8_DEPTHFM=calib AMODAL_BENCH_BATCH=1 python bench.py
run "depthfm deepcache2 + int8=calib stack" /tmp/b5_dfm_dc_calib.log \
  AMODAL_BENCH_DEPTHFM=1 AMODAL_DEEPCACHE_DEPTHFM=2 AMODAL_INT8_DEPTHFM=calib python bench.py
run "attention q_split interleave A/B (kernel-level, back-to-back)" /tmp/b5_qsplit_ab.log \
  python benchmarks/attn_qsplit_ab.py
run "flagship bench with AMODAL_ATTN_QSPLIT=2 (exact)" /tmp/b5_qsplit_bench.log \
  AMODAL_ATTN_QSPLIT=2 python bench.py
log "runbook v5 done"
