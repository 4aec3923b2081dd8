#!/bin/bash
# Runbook v15 (round 4): v14 showed SmoothQuant alone shrinks the calib
# chain's gate delta 0.129 -> ~0.10 — still 2x over the 0.05 gate — and
# that dropping the int8 head barely moves it (0.1016 no-head): the
# calibrated amax act scales themselves are the problem. The LN-bound
# scales (which CLIP outliers via int8 saturation) pass at 0.027. v15
# measures the two clip-based attacks (mixed scales, margin<1), the
# vitg b8 head-tile train fit, the fused-epilogue kernel A/B, and the
# heuristics warm-start.
cd /root/repo
echo $$ > /tmp/runbook15.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook15.log; }
log "runbook v15 start"

while [ -f /tmp/runbook14.pid ] && [ ! -f /tmp/runbook14.done ]; do
  log "waiting for runbook14"; sleep 120
done

probe() {
  while true; do
    timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
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
  git add $OUT && git commit -q -m "runbook v15: record '$title'"
}

# (a) mixed scales: LN-bound qkv/ffn1 (the gate-passing clip) +
# calib+smooth proj/ffn2 — full chain incl. head
run 3600 "quality gate: int8 MIXED scales + smooth=0.5 full chain" /tmp/b15_mixed.log \
  AMODAL_TPU_CACHE=1 AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_MIXED=1 \
  AMODAL_INT8_SMOOTH=0.5 python bench.py
# (b) outlier clip via margin<1 on the plain calib chain
run 3600 "quality gate: int8 calib chain margin=0.7 (outlier clip)" /tmp/b15_m07.log \
  AMODAL_TPU_CACHE=1 AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_MARGIN=0.7 python bench.py
# (c) vitg b8 single-chip train fit: head-tile=2 under adafactor
run 2400 "train step vitg@518 b8 adafactor head-tile=2 (the 595MB shave)" /tmp/b15_vitg.log \
  AMODAL_TPU_CACHE=1 AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg \
  AMODAL_BENCH_OPT=adafactor AMODAL_BENCH_BATCH=8 AMODAL_BENCH_HEAD_TILE=2 python bench.py
# (d) fused proj+LS+residual epilogue kernel vs XLA (single session)
run 2400 "fused epilogue A/B (pallas vs xla, vitl+vitg proj shapes)" /tmp/b15_fuse.log \
  python benchmarks/fused_epilogue_ab.py
# (e) heuristics demo: cold run SEEDING the persistent TPU cache
run 3600 "heuristics p2g demo COLD (seeding persistent cache)" /tmp/b15_heur_cold.log \
  AMODAL_TPU_CACHE=1 AMODAL_BENCH_HEURISTICS=1 python bench.py
# (f) warm start: same config, cache hit — first_pixel_s is the number
run 2400 "heuristics p2g demo WARM (persistent-cache hit, first-pixel wall)" /tmp/b15_heur_warm.log \
  AMODAL_TPU_CACHE=1 AMODAL_BENCH_HEURISTICS=1 python bench.py
log "runbook v15 done"
touch /tmp/runbook15.done
