#!/bin/bash
# Round-3 session-2 retry queue: the crowd_training_scale.py steps that
# failed in r3c on a sys.path bug (fixed — the script now inserts the repo
# root itself).  Run strictly after tpu_runbook_r3d.sh (single-client chip).
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3e.log
START=${1:-1}
run() {
    local step=$1 to=$2 desc=$3; shift 3
    [ "$step" -lt "$START" ] && return 0
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}

# 1/2. chunked-Pallas crowd TRAINING A/B at 131k (the MFU-justified
#      optimization target: the windowed-XLA backward at 0.14% MXU)
run 1 7200 "crowd train 131k windowed (control)" \
    python benchmarks/crowd_training_scale.py --sizes 131072 \
    --max-scene-size 64 --remat-steps --steps 2 \
    --out benchmarks/crowd_training_131k_windowed_r3.json
run 2 7200 "crowd train 131k chunked pallas" \
    python benchmarks/crowd_training_scale.py --sizes 131072 \
    --max-scene-size 64 --remat-steps --steps 2 --pallas \
    --out benchmarks/crowd_training_131k_pallas_r3.json

# 3. bf16 crowd-scale training headroom (VERDICT #5): 2M A/B + 4M attempt
run 3 14400 "crowd training bf16 2M/4M" \
    python benchmarks/crowd_training_scale.py \
    --sizes 2097152,4194304 --max-scene-size 64 --remat-steps \
    --grad-accum 8 --bf16 --steps 2 \
    --out benchmarks/crowd_training_bf16_r3.json

echo "=== runbook r3e done $(date)" | tee -a "$LOG"
