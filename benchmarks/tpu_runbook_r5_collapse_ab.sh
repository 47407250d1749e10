#!/bin/bash
# Round-5 closing session: A/B the diversity-collapse classifier gate
# (engine/rescue.py v2) on the two fold-runs the post-hoc replay
# (collapse_gate_scan.py) says it changes:
#   * s9/eth  — the out-of-sample stall: min~=avg~=0.69 from epoch 5000,
#               flat 25k epochs, v1 best 0.2722 (never rescued).
#               v2 should fire @~9000 (collapse signature) and convert.
#   * s2/eth  — a collapse phase that self-recovered under v1 (5-eval
#               streak, best 0.0782).  v2 fires @~8000: does the
#               intervention help, hurt, or wash on a fold that would
#               have escaped anyway?
# Identical command lines to the gated matrix (policy/cadence/seeds);
# the ONLY delta is the v2 classifier in the imported package code.
set -x
cd /root/repo
OV='{"g_ema_decay":0.999,"d_input_noise":0.05,"d_input_noise_steps":-1,"d_input_noise_floor":0.02}'
python benchmarks/ethucy_timematched.py --fold eth --epochs 30000 \
  --block 1000 --seed 9 --agent-frame --use-social --overrides "$OV" \
  --stall-blocks 31 --stall-grace 2 --stall-max-rescues 3 --classify-blocks 5 \
  --out benchmarks/collapse_ab_s9eth_v2.json
python benchmarks/ethucy_timematched.py --fold eth --epochs 30000 \
  --block 1000 --seed 2 --agent-frame --use-social --overrides "$OV" \
  --stall-blocks 31 --stall-grace 2 --stall-max-rescues 3 --classify-blocks 5 \
  --out benchmarks/collapse_ab_s2eth_v2.json
echo COLLAPSE_AB_DONE
