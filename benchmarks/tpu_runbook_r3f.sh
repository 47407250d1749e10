#!/bin/bash
# Round-3 session-3 TPU queue: the two untried stability axes for the
# big-toy worst-seed >=0.9 bar — model capacity (h128) and redundant
# categorical codes (6 codes / 3 modes, per-condition code-to-mode
# assignment insurance).  Run strictly after tpu_runbook_r3e.sh
# (single-client chip).
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3f.log
START=${1:-1}
run() {
    local step=$1 to=$2 desc=$3; shift 3
    [ "$step" -lt "$START" ] && return 0
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}

# 1. capacity + redundant-codes arms x documented big-toy recipe, 3 seeds
run 1 14400 "big-toy 40k h128 + codes6 arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+h128,robust1+info2+inoise2+codes6 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_h128codes6.json

echo "=== runbook r3f done $(date)" | tee -a "$LOG"
