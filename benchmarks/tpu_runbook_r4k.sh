#!/bin/bash
# Round-4 queue K: does the ADE-stall rescue (restore best + fresh D,
# --stall-blocks) convert the fold-level early-plateau stalls?
#  The 5-seed floor02 matrix (r4i/r4j) measured, WITHOUT rescue:
#   s0 0.0703/0.0803, s2 0.0724/0.0876, s4 0.0817/0.1093 (zara2 stall),
#   s1 0.1515/0.2569 (4 stalled folds), s3 0.1280/0.2075 (3 stalled).
#  Stall signature: <9% cumulative best-ADE improvement over the first
#  10 eval blocks; some stalls self-resolve late (s1 zara1 escaped at
#  ~25k to 0.065) => metastable equilibrium, fresh-D kick plausible.
#  1-3. stalled seeds 1/3/4 with --stall-blocks 5 (A/B vs r4i/r4j).
#  4-6. fresh seeds 5/6/7 with rescue on => 8-seed matrix, rescue-armed.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4k.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
OV='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02}'
for S in 1 3 4 5 6 7; do
    run "$S" 7200 "LOO floor02 seed $S + stall rescue" \
        python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
        --block 1000 --agent-frame --use-social --seed "$S" --stall-blocks 5 \
        --overrides "$OV" \
        --out "benchmarks/ethucy_timematched_loo_r4afsocial_ema_floor02_rescue_s$S.json"
done
echo "=== r4k done $(date)" | tee -a "$LOG"
