#!/bin/bash
# Round-5 ask #3: complete the 8-seed LOO matrix of the recommended
# configuration (record arm + graced rescue). Seeds 3/5/6/7 exist from
# r4l (ethucy_timematched_loo_r4afsocial_ema_floor02_gresc_s*.json);
# this runs the missing 0/1/2/4 under the IDENTICAL policy, strictly
# sequentially (the TPU is single-client).
set -x
cd /root/repo
for S in 0 1 2 4; do
  python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 500 --seed $S --agent-frame --use-social \
    --overrides '{"g_ema_decay":0.999,"d_input_noise":0.05,"d_input_noise_steps":-1,"d_input_noise_floor":0.02}' \
    --stall-blocks 5 --stall-grace 2 --stall-max-rescues 3 \
    --out benchmarks/ethucy_timematched_loo_r5gresc_s$S.json
done
echo RUNBOOK_DONE
