#!/bin/bash
# Round-5 ask #5 A/B, redesigned on the 8-seed evidence: the always-on
# graced rescue converts stalled seeds (s1 0.1515->0.0899) but HURTS
# healthy seeds (s0 0.0703->0.0829, s2 0.0724->0.1059 vs no-rescue).
# Treatment = signature-GATED rescue: patience 60 (> the 60-eval run,
# so the plain-patience path never fires) + --classify-blocks 5 — the
# rescue fires ONLY when 5 consecutive flat evals match the measured
# broad-under-fit signature (avg/min >= 3, train ~ avg). Healthy-seed
# controls: the r4i no-rescue runs (s0 0.0703, s2 0.0724); stalled-seed
# controls: no-rescue s1 0.1515 and graced-always s1 0.0899.
set -x
cd /root/repo
for S in 1 0 2; do
  python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 500 --seed $S --agent-frame --use-social \
    --overrides '{"g_ema_decay":0.999,"d_input_noise":0.05,"d_input_noise_steps":-1,"d_input_noise_floor":0.02}' \
    --stall-blocks 60 --stall-grace 2 --stall-max-rescues 3 \
    --classify-blocks 5 \
    --out benchmarks/ethucy_timematched_loo_r5gated_s$S.json
done
echo CLSF_RUNBOOK_DONE
