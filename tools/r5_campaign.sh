#!/bin/bash
# Round-5 serial chip campaign: one chip client at a time, each stage
# timeout-bounded so a relay wedge loses at most one stage.
# Stages: GEGLU-nogelu probe A/B -> cars 50-step BLIP-D bench -> sustained
# soak (>=1000 augs) -> BLIP-D trace -> final bench.py.
set -u
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r5_campaign}
mkdir -p "$LOGDIR"

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== stage $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/campaign.log"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name exit=$rc $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/campaign.log"
  tail -3 "$LOGDIR/$name.log" | tee -a "$LOGDIR/campaign.log"
}

stage nogelu 2400 python -m tools.ab_interleave SASPA_GEGLU_NOGELU 1 0 --rounds 6
stage cars50 2400 env BENCH_STEPS=50 python tools/backbone_bench.py blip_diffusion-controlnet
stage soak 3000 python -m tools.soak --images 550 --num_per_image 2
stage blip_trace 2400 python tools/profile_fused.py --trace --backbone blip_diffusion-controlnet --batch 4
stage bench 2400 python bench.py
echo "=== campaign done $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/campaign.log"
