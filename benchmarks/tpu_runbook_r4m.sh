#!/bin/bash
# Round-4 queue M: (a) stall DIAGNOSIS — re-run seed-1's stalled folds
# (eth 0.216, hotel 0.145 in the no-rescue matrix) plus the healthy
# seed-0 eth control with the new avg-of-K + train-ADE curve logging
# (identical seed/stream => the stall reproduces; avg≈min means the 20
# samples collapsed, train_ade vs eval locates the gap);
# (b) recipe-bundle A/B — the toy `--recipe flagship` bundle
# (categorical 3 codes, D-lr 5e-4 decayed 0.7/10k, info 1.0) measured
# on the LOO protocol vs the default-hyper record arm, graced rescue
# armed, seeds 0/1 (one healthy seed, one stall-prone seed).
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4m.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
OV='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02}'
OVR='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02, "latent_code_type": "categorical", "n_latent_codes": 3, "lr_d": 0.0005, "loss_info_w": 1.0, "d_lr_decay_rate": 0.7, "d_lr_decay_steps": 10000}'
run 1 1800 "diag: seed-1 eth (stalled in r4i)" \
    python benchmarks/ethucy_timematched.py --fold eth --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 1 --overrides "$OV" \
    --out benchmarks/ethucy_timematched_diag_eth_s1.json
run 2 1200 "diag: seed-1 hotel (stalled in r4i)" \
    python benchmarks/ethucy_timematched.py --fold hotel --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 1 --overrides "$OV" \
    --out benchmarks/ethucy_timematched_diag_hotel_s1.json
run 3 1800 "diag: seed-0 eth (healthy control)" \
    python benchmarks/ethucy_timematched.py --fold eth --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 0 --overrides "$OV" \
    --out benchmarks/ethucy_timematched_diag_eth_s0.json
for S in 0 1; do
    run "4-$S" 7200 "LOO recipe-bundle seed $S + graced rescue" \
        python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
        --block 1000 --agent-frame --use-social --seed "$S" \
        --stall-blocks 5 --stall-grace 2 --stall-max-rescues 3 \
        --overrides "$OVR" \
        --out "benchmarks/ethucy_timematched_loo_r4recipebundle_gresc_s$S.json"
done
echo "=== r4m done $(date)" | tee -a "$LOG"
