#!/bin/bash
# Round-4 queue N: (a) complete the graced-rescue matrix to the full
# 8-seed protocol (seeds 0/1/2/4 were measured no-rescue in r4i/r4j;
# graced cells missing) — the recommended LOO configuration
# (BASELINE.md) is "record arm + graced rescue", so the 8-seed row
# should be exactly that config; (b) stall PREVENTION arms on the
# stalled seed-1 eth fold, mechanism-driven by the r4m diagnosis
# (broad-distribution under-fit: diverse samples, center never
# sharpens): the variety loss (min-of-K L2, the soft anchor — pulls
# only the closest sample toward data, sharpening accuracy without
# collapsing diversity) and the plain L2 loss (hard mean anchor,
# reference default w=0.5) — prevention vs the rescue's cure.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4n.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
OV='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02}'
OVV='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02, "use_variety_loss": true}'
OVL='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02, "use_l2_loss": true}'
run "p-var" 1800 "prevention: seed-1 eth + variety loss" \
    python benchmarks/ethucy_timematched.py --fold eth --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 1 --overrides "$OVV" \
    --out benchmarks/ethucy_timematched_prevent_eth_s1_variety.json
run "p-l2" 1800 "prevention: seed-1 eth + l2 loss (w=0.5)" \
    python benchmarks/ethucy_timematched.py --fold eth --epochs 30000 \
    --block 1000 --agent-frame --use-social --seed 1 --overrides "$OVL" \
    --out benchmarks/ethucy_timematched_prevent_eth_s1_l2.json
for S in 0 1 2 4; do
    run "$S" 7200 "LOO floor02 seed $S + graced/capped rescue" \
        python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
        --block 1000 --agent-frame --use-social --seed "$S" \
        --stall-blocks 5 --stall-grace 2 --stall-max-rescues 3 \
        --overrides "$OV" \
        --out "benchmarks/ethucy_timematched_loo_r4afsocial_ema_floor02_gresc_s$S.json"
done
echo "=== r4n done $(date)" | tee -a "$LOG"
