#!/bin/bash
# Round-5 closing session: PROSPECTIVE validation of the shipped v2
# classifier (under-fit + diversity-collapse gates) on eight seeds
# (16-23) never seen by any policy decision.  Unlike the seeds 8-15
# extension (run under v1; s9/eth's collapse stall went unrescued and
# was fixed retroactively via the A/B), these run the full shipped
# policy live: any stall of either class should be auto-rescued and
# logged with its signature.  Identical arm/cadence to the whole
# gated matrix.  Strictly sequential (single-client TPU).
set -x
cd /root/repo
OV='{"g_ema_decay":0.999,"d_input_noise":0.05,"d_input_noise_steps":-1,"d_input_noise_floor":0.02}'
for S in 16 17 18 19 20 21 22 23; do
  python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --seed $S --agent-frame --use-social \
    --overrides "$OV" \
    --stall-blocks 31 --stall-grace 2 --stall-max-rescues 3 --classify-blocks 5 \
    --out benchmarks/ethucy_timematched_loo_r5gated_s$S.json
done
echo V2_PROSPECTIVE_DONE
