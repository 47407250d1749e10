#!/bin/bash
# Round-3 follow-up TPU queue (after tpu_runbook_r3.sh): the session's two
# new levers — the minibatch-stddev recipes (the live hypothesis for the
# big-toy >=0.9 worst-seed bar after the 80k anneal arms missed it) and the
# chunked-Pallas crowd-training A/B (the optimization the MFU numbers
# justify).  Single-client chip: run strictly after the first runbook.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3b.log
START=${1:-1}
run() {
    local step=$1 to=$2 desc=$3; shift 3
    [ "$step" -lt "$START" ] && return 0
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}

# 1. mb_std x the documented big-toy recipe, 3 seeds, 40k
run 1 14400 "big-toy 40k mbstd arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+mbstd,robust1+info2+inoise2+mbstd \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_mbstd.json

# 2. chunked-Pallas crowd TRAINING A/B at 131k (the MFU-justified target):
#    windowed-XLA backward vs chunked fused kernels, f32, same flags
run 2 7200 "crowd train 131k windowed (control)" \
    python benchmarks/crowd_training_scale.py --sizes 131072 \
    --max-scene-size 64 --remat-steps --steps 2 \
    --out benchmarks/crowd_training_131k_windowed_r3.json
run 3 7200 "crowd train 131k chunked pallas" \
    python benchmarks/crowd_training_scale.py --sizes 131072 \
    --max-scene-size 64 --remat-steps --steps 2 --pallas \
    --out benchmarks/crowd_training_131k_pallas_r3.json

# 4. small-toy mbstd (does it also lift the small toy / hurt anything?)
run 4 14400 "small-toy 40k mbstd x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+inoise2+mbstd \
    --seeds 0,1,2 --toys small --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_small40k_mbstd.json

# 5/6. crowd SIM A/B at 131k f32 (above the 16k fused cap: windowed XLA
#      vs chunked Pallas forward)
run 5 3600 "crowd sim 131k windowed (control)" \
    python -m socialways_tpu.cli.main simulate --agents 131072 \
    --scene-size 64 --windows 1 --no-pallas
run 6 3600 "crowd sim 131k chunked pallas" \
    python -m socialways_tpu.cli.main simulate --agents 131072 \
    --scene-size 64 --windows 1

echo "=== runbook r3b done $(date)" | tee -a "$LOG"
