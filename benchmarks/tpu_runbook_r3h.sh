#!/bin/bash
# Round-3 session-3 master queue (reordered by decision value after the
# mode-seeking arm cleared the bar on its first seeds):
#   wait for the in-flight r3d step-1 runner (PID given as $1) ->
#   r3g (ms seed-widening x5 via ensemble) ->
#   r3e (crowd 131k windowed-vs-chunked-Pallas A/B + bf16 2M/4M) ->
#   r3d steps 2-4 (bs768, unroll2, ds hinge arms) ->
#   r3f (h128 + codes6 arms).
# Single-client chip: strictly sequential.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3h.log
WAIT_PID=${1:-0}

if [ "$WAIT_PID" -gt 0 ]; then
    echo "=== waiting for in-flight run pid $WAIT_PID" | tee -a "$LOG"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "=== pid $WAIT_PID done $(date +%H:%M:%S)" | tee -a "$LOG"
    sleep 60   # single-client chip: let the tunnel settle
fi

bash benchmarks/tpu_runbook_r3g.sh 2>&1 | tee -a "$LOG"
bash benchmarks/tpu_runbook_r3e.sh 2>&1 | tee -a "$LOG"

# r3d steps 2-4 (its step 1 ran separately)
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] r3d-cont step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- r3d-cont step $step rc=$?" | tee -a "$LOG"
}
run 2 14400 "big-toy 40k bs768 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+bs768 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_bs768.json
run 3 14400 "big-toy 40k unroll2 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+unroll2 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_unroll2.json
run 4 21600 "big-toy 40k ds hinge arms x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+ds05,robust1+info2+inoise2+ds10,robust1+info2+inoise2+ds05k4 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_ds.json

bash benchmarks/tpu_runbook_r3f.sh 2>&1 | tee -a "$LOG"

echo "=== runbook r3h done $(date)" | tee -a "$LOG"
