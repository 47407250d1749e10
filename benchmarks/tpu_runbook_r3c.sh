#!/bin/bash
# Round-3 session-2 TPU queue: everything the interrupted r3/r3b runbooks
# left unfinished, re-ordered by decision value.  Single-client chip — run
# this alone.  Each step writes its own artifact; failures don't block.
#
# Usage: bash benchmarks/tpu_runbook_r3c.sh [start_step]
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3c.log
START=${1:-1}
run() {  # run <step> <timeout_s> <desc> <cmd...>
    local step=$1 to=$2 desc=$3; shift 3
    [ "$step" -lt "$START" ] && return 0
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}

# 1. THE BAR (VERDICT #1): mb_std arms x the documented big-toy recipe
run 1 14400 "big-toy 40k mbstd arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+mbstd,robust1+info2+inoise2+mbstd \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_mbstd.json

# 2/3. chunked-Pallas crowd TRAINING A/B at 131k (the MFU-justified
#      optimization): windowed-XLA backward vs chunked fused kernels
run 2 7200 "crowd train 131k windowed (control)" \
    python benchmarks/crowd_training_scale.py --sizes 131072 \
    --max-scene-size 64 --remat-steps --steps 2 \
    --out benchmarks/crowd_training_131k_windowed_r3.json
run 3 7200 "crowd train 131k chunked pallas" \
    python benchmarks/crowd_training_scale.py --sizes 131072 \
    --max-scene-size 64 --remat-steps --steps 2 --pallas \
    --out benchmarks/crowd_training_131k_pallas_r3.json

# 4/5. crowd SIM A/B at 131k f32 (above the 16k fused cap)
run 4 3600 "crowd sim 131k windowed (control)" \
    python -m socialways_tpu.cli.main simulate --agents 131072 \
    --scene-size 64 --windows 1 --no-pallas
run 5 3600 "crowd sim 131k chunked pallas" \
    python -m socialways_tpu.cli.main simulate --agents 131072 \
    --scene-size 64 --windows 1

# 6. bf16 crowd-scale training headroom (VERDICT #5): 2M A/B + 4M attempt
run 6 14400 "crowd training bf16 2M/4M" \
    python benchmarks/crowd_training_scale.py \
    --sizes 2097152,4194304 --max-scene-size 64 --remat-steps \
    --grad-accum 8 --bf16 --steps 2 \
    --out benchmarks/crowd_training_bf16_r3.json

# 7. SN-GAN verdict on the TPU stream (VERDICT #7; interrupted in r3)
run 7 14400 "SN small-toy TPU-stream confirm" \
    python benchmarks/coverage_robustness.py --recipes robust1+sn \
    --seeds 0,1,2 --toys small --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_sn_small.json

# 8. small-toy mbstd (does it also lift the small toy / hurt anything?)
run 8 14400 "small-toy 40k mbstd x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+inoise2+mbstd \
    --seeds 0,1,2 --toys small --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_small40k_mbstd.json

echo "=== runbook r3c done $(date)" | tee -a "$LOG"
