#!/bin/bash
# Round-3 session-3 winner-widening queue: the mode-seeking arm
# (robust1+info2+inoise2+ms) cleared the worst-seed bar on seeds 0-2 —
# widen the SAME recipe to seeds 3-7 via the ensemble harness (one run of
# wall clock, per-member divergence rescue), mirroring the 8-seed protocol
# used for the base recipe in round 3.  Run after tpu_runbook_r3f.sh.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3g.log
START=${1:-1}
run() {
    local step=$1 to=$2 desc=$3; shift 3
    [ "$step" -lt "$START" ] && return 0
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}

run 1 14400 "big-toy 40k ms ensemble x5 extra seeds" \
    python benchmarks/coverage_ensemble.py --toy big --seeds 3,4,5,6,7 \
    --steps 40000 --block 2000 --auto-recover \
    --overrides '{"loss_info_w": 2.0, "lr_d": 5e-4, "d_lr_decay_rate": 0.7, "d_lr_decay_steps": 10000, "d_input_noise": 0.05, "d_input_noise_steps": 40000, "ms_weight": 0.1}' \
    --out benchmarks/coverage_ensemble_r3_big40k_ms_s34567.json

echo "=== runbook r3g done $(date)" | tee -a "$LOG"
