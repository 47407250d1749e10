#!/bin/bash
# Round-5 ask #5 A/B: classifier-triggered rescue on the reproducible
# stalled seeds. Controls = the graced-policy runs (seed 1 from the r5
# 8-seed completion, seed 3 from r4l). Treatment = identical arm+policy
# plus --classify-blocks 2 (the broad-under-fit signature fires after 2
# flat matching evals instead of the full 5-block patience).
# Runs strictly sequentially after the 8-seed runbook (single-client TPU).
set -x
cd /root/repo
for S in 1 3; do
  python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 500 --seed $S --agent-frame --use-social \
    --overrides '{"g_ema_decay":0.999,"d_input_noise":0.05,"d_input_noise_steps":-1,"d_input_noise_floor":0.02}' \
    --stall-blocks 5 --stall-grace 2 --stall-max-rescues 3 \
    --classify-blocks 2 \
    --out benchmarks/ethucy_timematched_loo_r5clsf_s$S.json
done
echo CLSF_RUNBOOK_DONE
