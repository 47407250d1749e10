#!/bin/bash
# Round-5 closing session: extend the gated 8-seed LOO matrix with eight
# FRESH seeds (8-15) under the IDENTICAL policy and cadence as
# loo_8seed_gated_r5.json (the shipped `--recipe loo` configuration):
# --block 1000 (30 evals), signature-gated rescue only
# (--stall-blocks 31 disables the patience path; --classify-blocks 5).
# Purpose: out-of-sample validation of the policy chosen ON seeds 0-7 —
# the gated-vs-graced comparison was decided on those seeds, so seeds
# 8-15 are the honest generalization check. Strictly sequential
# (single-client TPU).
set -x
cd /root/repo
OV='{"g_ema_decay":0.999,"d_input_noise":0.05,"d_input_noise_steps":-1,"d_input_noise_floor":0.02}'
for S in 8 9 10 11 12 13 14 15; do
  python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --seed $S --agent-frame --use-social \
    --overrides "$OV" \
    --stall-blocks 31 --stall-grace 2 --stall-max-rescues 3 --classify-blocks 5 \
    --out benchmarks/ethucy_timematched_loo_r5gated_s$S.json
done
echo GATED_EXT_DONE
