#!/bin/bash
# Round-4 queue A: complete the 8-seed protocol matrix (VERDICT-r3 #2).
# Seeds 0-2 of each recipe exist from round 3 (coverage_robustness, cli
# train path); these ensemble runs add seeds 3-7 so every documented
# recipe row is 8-seed.  Ensemble base == robust1 (categorical 3 codes,
# lr_d 5e-4, d-lr decay 0.7/10k, info 1.0) + per-arm overrides matching
# the coverage_robustness RECIPES entries exactly (h128 also scales
# social_feature_size/noise_len the way cli train does).
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4a.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
run 1 7200 "small-toy 40k robust1+inoise2+af ensemble x5 extra seeds" \
    python benchmarks/coverage_ensemble.py --toy small --seeds 3,4,5,6,7 \
    --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true}' \
    --out benchmarks/coverage_ensemble_r4_small40k_af_s34567.json
run 2 7200 "small-toy 40k robust1+inoise2+mbstd ensemble x5 extra seeds" \
    python benchmarks/coverage_ensemble.py --toy small --seeds 3,4,5,6,7 \
    --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "mb_std": true}' \
    --out benchmarks/coverage_ensemble_r4_small40k_mbstd_s34567.json
run 3 10800 "big-toy 40k robust1+info2+inoise2+h128 ensemble x5 extra seeds" \
    python benchmarks/coverage_ensemble.py --toy big --seeds 3,4,5,6,7 \
    --steps 40000 --block 2000 --auto-recover \
    --overrides '{"loss_info_w": 2.0, "d_input_noise": 0.05, "d_input_noise_steps": 40000, "hidden_size": 128, "social_feature_size": 128, "noise_len": 64}' \
    --out benchmarks/coverage_ensemble_r4_big40k_h128_s34567.json
echo "=== r4a done $(date)" | tee -a "$LOG"
