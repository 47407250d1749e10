#!/bin/bash
# Round-3 session-2 follow-up TPU queue: the next candidate levers for the
# big-toy worst-seed >=0.9 bar, in prior order — mode-seeking (MSGAN),
# full-batch steps, deeper unrolling.  Run strictly after tpu_runbook_r3c.sh
# (single-client chip).
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3d.log
START=${1:-1}
run() {
    local step=$1 to=$2 desc=$3; shift 3
    [ "$step" -lt "$START" ] && return 0
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}

# 1. mode-seeking arms x documented big-toy recipe, 3 seeds, 40k
run 1 14400 "big-toy 40k mode-seeking arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+ms,robust1+info2+inoise2+ms05 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_ms.json

# 2. full-batch (768) steps: every condition in every update
run 2 14400 "big-toy 40k bs768 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+bs768 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_bs768.json

# 3. deeper unrolled lookahead (the paper's own anti-collapse lever)
run 3 14400 "big-toy 40k unroll2 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+unroll2 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_unroll2.json

# 4. DSGAN per-sample diversity hinge (tau calibrated from the measured
#    per-row d/dz distribution; see coverage_robustness.py recipe notes)
run 4 21600 "big-toy 40k ds hinge arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+ds05,robust1+info2+inoise2+ds10,robust1+info2+inoise2+ds05k4 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_ds.json

echo "=== runbook r3d done $(date)" | tee -a "$LOG"
