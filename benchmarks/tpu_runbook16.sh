#!/bin/bash
# Runbook v16 (round 4, fresh-VM session): the VM reset wiped /tmp and
# the persistent TPU compile cache before runbooks v15b/c/d ran — this
# consolidates every pending row, highest value first:
#   1. trained-proxy@1022 serving-scale gate verdicts (v15c) — the
#      closest pre-checkpoint evidence for the 3.7 img/s calib chain
#   2. heuristics demo cold (cache seed) + warm first-pixel (VERDICT #5)
#   3. fused proj+LayerScale+residual epilogue A/B (VERDICT #6)
#   4. vitg@518 b8 tile=4 / b12 tile=2 train fits (v15d)
#   5. int8 mixed-scales / margin clip retries (v15b; proxy-v2 says
#      these are random-proxy artifacts — measured last, for the table)
cd /root/repo
echo $$ > /tmp/runbook16.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/runbook16.log; }
log "runbook v16 start"

probe() {
  while true; do
    timeout 420 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,)))))" >/dev/null 2>&1
    if [ $? -eq 0 ]; then log "tunnel UP"; return; fi
    log "tunnel still down"; sleep 180
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
  git add $OUT && git commit -q -m "runbook v16: record '$title'"
}

NP="AMODAL_BENCH_NO_PROBE=1 AMODAL_TPU_CACHE=1"
PX="AMODAL_PROXY_CKPT=checkpoints/proxy"

# (1) trained proxy at serving scale: the knob the two proxies disagree
# on hardest (random 0.129 FAIL vs trained-CPU 0.011-0.021 PASS)
run 5400 "trained-proxy@1022: int8 calib chain (base+amodal+head)" /tmp/b16_calib.log \
  $NP $PX AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 python bench.py
# (2) trained proxy, late gentle ToMe (trained-CPU PASS 0.022 vs random FAIL 0.16)
run 3600 "trained-proxy@1022: tome base 9,1280 (late gentle merge)" /tmp/b16_tome.log \
  $NP $PX AMODAL_QUALITY=1 AMODAL_TOME_BASE=9,1280 python bench.py
# (3) trained proxy, calib + late-gentle stack (both-PASS candidates stacked)
run 3600 "trained-proxy@1022: int8 calib + tome base 9,1280 stack" /tmp/b16_stack.log \
  $NP $PX AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 AMODAL_TOME_BASE=9,1280 python bench.py
# (4) heuristics demo cold: seeds the (fresh) persistent cache
run 5400 "heuristics p2g demo COLD (seeding persistent cache)" /tmp/b16_heur_cold.log \
  $NP AMODAL_BENCH_HEURISTICS=1 python bench.py
# (5) warm start: same config, cache hit — first-pixel wall is the number
run 2400 "heuristics p2g demo WARM (persistent-cache hit, first-pixel wall)" /tmp/b16_heur_warm.log \
  $NP AMODAL_BENCH_HEURISTICS=1 python bench.py
# (6) fused epilogue A/B prints custom "ms" lines, not bench JSON
probe
log "fused epilogue A/B"
timeout 2400 python benchmarks/fused_epilogue_ab.py > /tmp/b16_fuse.log 2>&1
rc=$?
{ echo; echo "## fused epilogue A/B (pallas vs xla) (rc=$rc)"; echo '```';
  grep -v WARNING /tmp/b16_fuse.log | tail -20; echo '```'; } >> $OUT
git add $OUT && git commit -q -m "runbook v16: record 'fused epilogue A/B'"
# (7) vitg b8 head-tile=4: halve head serialization vs tile=2's 1845 ms
run 2400 "train step vitg@518 b8 adafactor head-tile=4" /tmp/b16_vitg4.log \
  $NP AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg \
  AMODAL_BENCH_OPT=adafactor AMODAL_BENCH_BATCH=8 AMODAL_BENCH_HEAD_TILE=4 python bench.py
# (8) vitg b12 tile=2: push the new ceiling
run 2400 "train step vitg@518 b12 adafactor head-tile=2 (push the new ceiling)" /tmp/b16_vitg12.log \
  $NP AMODAL_BENCH_TRAIN=1 AMODAL_BENCH_ENCODER=vitg \
  AMODAL_BENCH_OPT=adafactor AMODAL_BENCH_BATCH=12 AMODAL_BENCH_HEAD_TILE=2 python bench.py
# (9) mixed scales retry (random-weight proxy table completion)
run 5400 "quality gate: int8 MIXED scales + smooth=0.5 full chain (retry)" /tmp/b16_mixed.log \
  $NP AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_MIXED=1 \
  AMODAL_INT8_SMOOTH=0.5 python bench.py
# (10) margin clip retry
run 5400 "quality gate: int8 calib chain margin=0.7 (outlier clip) (retry)" /tmp/b16_m07.log \
  $NP AMODAL_QUALITY=1 AMODAL_INT8_BASE=1 AMODAL_INT8_AMODAL=1 \
  AMODAL_INT8_HEAD=1 AMODAL_INT8_CALIB=1 AMODAL_INT8_MARGIN=0.7 python bench.py
log "runbook v16 done"
touch /tmp/runbook16.done
