#!/bin/bash
# Round-4 queue J: floor-recipe seed matrix, continued.
#  r4i found: seed 0 = 0.0703/0.0803 (record), seed 2 = 0.0724/0.0876
#  (reproduces), seed 1 = 0.1515/0.2569 (STALL: 4/5 folds plateau flat
#  from the first eval block — no divergence, a bad early equilibrium).
#  1-2. seeds 3 and 4 → stall-rate estimate over 5 seeds.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4j.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
OV='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02}'
run 1 7200 "LOO floor02 seed 3" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 3 --overrides "$OV" \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_ema_floor02_s3.json
run 2 7200 "LOO floor02 seed 4" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 4 --overrides "$OV" \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_ema_floor02_s4.json
echo "=== r4j done $(date)" | tee -a "$LOG"
