#!/bin/bash
# Round-3 session-3 master queue, revision 2.  The ms arm measured
# 0.978/0.954/0.812 (seed2 = GENUINE per-condition collapse: one mode
# absent at K=256 — coverage_vs_k.py), so ms widening is dropped and the
# DSGAN per-sample hinge arms (designed for exactly that failure) run
# first, then the crowd A/Bs (VERDICT #5), then the remaining arms in
# hypothesis-strength order.  Waits for the in-flight step-1 runner
# (PID $1) — single-client chip.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3i.log
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

# 1. DSGAN hinge arms (the per-condition lever)
run 1 21600 "big-toy 40k ds hinge arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+ds05k4,robust1+info2+inoise2+ds05,robust1+info2+inoise2+ds10 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_ds.json

# 2. crowd A/Bs + bf16 scale (VERDICT #5 / the MFU-justified optimization)
bash benchmarks/tpu_runbook_r3e.sh 2>&1 | tee -a "$LOG"

# 3. remaining coverage arms, hypothesis-strength order (partial JSON is
#    written per-seed, so a session-end cutoff loses only the tail)
run 3 14400 "big-toy 40k bs768 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+bs768 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_bs768.json
run 4 14400 "big-toy 40k unroll2 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+unroll2 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_unroll2.json
run 5 14400 "big-toy 40k h128 + codes6 arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+h128,robust1+info2+inoise2+codes6 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_h128codes6.json

echo "=== runbook r3i done $(date)" | tee -a "$LOG"
