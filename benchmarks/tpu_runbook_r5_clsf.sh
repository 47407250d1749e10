#!/bin/bash
# Round-5 ask #5 A/B: signature-GATED rescue, at the canonical
# --block 1000 cadence (same as every control). The 8-seed evidence:
# the always-on graced rescue converts stalled seeds but can hurt
# healthy ones (and at the finer block-500 cadence it fires 3-5x more
# often and hurts more). Treatment: patience 31 (> the 30-eval run, so
# the plain-patience path never fires) + --classify-blocks 5 — the
# rescue fires ONLY when 5 consecutive flat evals match the measured
# broad-under-fit signature (avg/min >= 3, train ~ avg). Controls:
# no-rescue r4i (s0 0.0703 / s1 0.1515 / s2 0.0724) and graced-always
# (r4l/r5 block-1000 artifacts).
set -x
cd /root/repo
for S in 1 0 2; do
  python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --seed $S --agent-frame --use-social \
    --overrides '{"g_ema_decay":0.999,"d_input_noise":0.05,"d_input_noise_steps":-1,"d_input_noise_floor":0.02}' \
    --stall-blocks 31 --stall-grace 2 --stall-max-rescues 3 \
    --classify-blocks 5 \
    --out benchmarks/ethucy_timematched_loo_r5gated_s$S.json
done
echo CLSF_RUNBOOK_DONE
