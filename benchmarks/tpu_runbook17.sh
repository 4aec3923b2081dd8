#!/bin/bash
# Runbook v17 (round 4): weight-only int4 rows. The pix2gestalt
# 100-step DDIM is PARAM-READ-BOUND (batched CFG neutral, W8 wo gave
# 4.1 -> 3.45 s, deepcache skips deep-level param traffic for 2.17 s
# with wo). W4 (nibble-packed, per-group-64 scales) halves the weight
# bytes again — these rows measure where the read-bound curve lands and
# gate the quality proxy. DepthFM rows check the same knob where the
# b8 path is NOT param-bound (expect ~neutral throughput, p50 lever).
cd /root/repo
echo $$ > /tmp/runbook17.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook17.log; }
log "runbook v17 start"
while [ -f /tmp/runbook16.pid ] && [ ! -f /tmp/runbook16.done ]; do
  log "waiting for runbook16"; sleep 120
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
  git add $OUT && git commit -q -m "runbook v17: record '$title'"
}
NP="AMODAL_BENCH_NO_PROBE=1 AMODAL_TPU_CACHE=1"
# (1) p2g weight-only int4, quality-gated
run 5400 "heuristics p2g int8=w4 (weight-only int4, quality gate)" /tmp/b17_p2g_w4.log \
  $NP AMODAL_BENCH_HEURISTICS=1 AMODAL_QUALITY=1 AMODAL_INT8_P2G=w4 python bench.py
# (2) p2g w4 + deepcache5 stack (current best gated: wo+dc5 2.17 s)
run 5400 "heuristics p2g int8=w4 + deepcache5 (quality gate)" /tmp/b17_p2g_w4dc.log \
  $NP AMODAL_BENCH_HEURISTICS=1 AMODAL_QUALITY=1 AMODAL_INT8_P2G=w4 \
  AMODAL_DEEPCACHE_P2G=5 python bench.py
# (3) DepthFM w4 b8 throughput + quality
run 3600 "depthfm int8=w4 b8 (weight-only int4, quality)" /tmp/b17_dfm_w4.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_QUALITY=1 AMODAL_INT8_DEPTHFM=w4 python bench.py
# (4) DepthFM w4 b1 latency (wo int8 read p50 95 ms in v15-era rows)
run 3600 "depthfm int8=w4 b1 (latency)" /tmp/b17_dfm_w4b1.log \
  $NP AMODAL_BENCH_DEPTHFM=1 AMODAL_BENCH_BATCH=1 AMODAL_INT8_DEPTHFM=w4 python bench.py
log "runbook v17 done"
touch /tmp/runbook17.done
