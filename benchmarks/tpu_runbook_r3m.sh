#!/bin/bash
# Session-3 final queue: widening retry (the ensemble crashed on a
# transient TPU FailedPrecondition right after a client kill), then the
# small-toy af arm, then the remaining world-frame arms until cutoff.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r3m.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
sleep 240   # let the tunnel recover from the killed client
run 1 7200 "big-toy 40k inoise2+af ensemble x5 extra seeds (retry)" \
    python benchmarks/coverage_ensemble.py --toy big --seeds 3,4,5,6,7 \
    --steps 40000 --block 2000 --auto-recover \
    --overrides '{"loss_info_w": 1.0, "lr_d": 5e-4, "d_lr_decay_rate": 0.7, "d_lr_decay_steps": 10000, "d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true}' \
    --out benchmarks/coverage_ensemble_r3_big40k_af_s34567.json
run 2 14400 "small-toy 40k af arm x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+inoise2+af \
    --seeds 0,1,2 --toys small --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_small40k_af.json
run 3 14400 "big-toy 40k unroll2+h128+codes6 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+unroll2,robust1+info2+inoise2+h128,robust1+info2+inoise2+codes6 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_rest.json
echo "=== r3m done $(date)" | tee -a "$LOG"
