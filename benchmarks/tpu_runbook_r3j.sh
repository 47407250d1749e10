#!/bin/bash
# Round-3 session-3 master queue, revision 3.  ds05k4 seed0 scored last5
# 0.966 and the agent-frame CPU pilot converges, so after the in-flight
# ds arms (runner PID $1): agent-frame arms (the structural fix) first,
# then the crowd A/Bs (VERDICT #5), then widening/remaining arms.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3j.log
WAIT_PID=${1:-0}

if [ "$WAIT_PID" -gt 0 ]; then
    echo "=== waiting for in-flight run pid $WAIT_PID" | tee -a "$LOG"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "=== pid $WAIT_PID done $(date +%H:%M:%S)" | tee -a "$LOG"
    sleep 60
fi

run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}

# 1. agent-frame arms x3 seeds (structural per-condition-collapse fix)
run 1 14400 "big-toy 40k agent-frame arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+af,robust1+inoise2+af \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_af.json

# 2. crowd A/Bs + bf16 scale (VERDICT #5 / the MFU-justified optimization)
bash benchmarks/tpu_runbook_r3e.sh 2>&1 | tee -a "$LOG"

# 3. remaining coverage arms in hypothesis-strength order
run 3 14400 "big-toy 40k unroll2 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+unroll2 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_unroll2.json
run 4 14400 "big-toy 40k bs768 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+bs768 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_bs768.json
run 5 14400 "big-toy 40k h128 + codes6 arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+h128,robust1+info2+inoise2+codes6 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_h128codes6.json

echo "=== runbook r3j done $(date)" | tee -a "$LOG"
