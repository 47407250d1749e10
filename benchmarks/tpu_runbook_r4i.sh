#!/bin/bash
# Round-4 queue I: robustness of the anneal-to-floor LOO record.
#  1-2. --d-input-noise-floor 0.02 at seeds 1 and 2 (the record arm ran
#       seed 0: avg best 0.0703/0.0803) — is the no-weak-fold behavior
#       seed-robust?
#  3.   floor 0.03 sensitivity arm (same seed 0) — how sharp is the
#       floor choice?
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4i.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
OV='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02}'
run 1 7200 "LOO floor02 seed 1" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 1 --overrides "$OV" \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_ema_floor02_s1.json
run 2 7200 "LOO floor02 seed 2" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 2 --overrides "$OV" \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_ema_floor02_s2.json
run 3 7200 "LOO floor03 sensitivity (seed 0)" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social \
    --overrides '{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.03}' \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_ema_floor03.json
echo "=== r4i done $(date)" | tee -a "$LOG"
