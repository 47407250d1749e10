#!/bin/bash
# Round-5 ask #3: complete the 8-seed LOO matrix of the recommended
# configuration (record arm + graced rescue). Seeds 3/5/6/7 exist from
# r4l; this runs the missing 0/1/2/4 under the IDENTICAL policy
# INCLUDING the eval cadence: --block 1000 (30 evals; patience 5 blocks
# = 5000 epochs), the production default (--ade-stall-recover implies
# eval_every = n_epochs/30). A first attempt at --block 500 measured a
# much more trigger-happy policy (21-22 rescues/seed vs 4-8, and worse
# outcomes on healthy seeds) — kept as
# ethucy_timematched_loo_r5gresc_block500_s*.json, the cadence-
# sensitivity observation. Strictly sequential (single-client TPU).
set -x
cd /root/repo
for S in 0 1 2 4; do
  python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --seed $S --agent-frame --use-social \
    --overrides '{"g_ema_decay":0.999,"d_input_noise":0.05,"d_input_noise_steps":-1,"d_input_noise_floor":0.02}' \
    --stall-blocks 5 --stall-grace 2 --stall-max-rescues 3 \
    --out benchmarks/ethucy_timematched_loo_r5gresc_s$S.json
done
echo RUNBOOK_DONE
