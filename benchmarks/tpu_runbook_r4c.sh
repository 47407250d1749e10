#!/bin/bash
# Round-4 queue C:
#  1. Full 5-fold synthetic-LOO protocol with the flagship composition
#     (agent-frame + social) — the round-3 LOO artifact
#     (ethucy_timematched_loo.json, 0.404/0.716 avg best) re-run at the
#     new best configuration.
#  2-3. The dip-mechanism fix lever measured at the full 8-seed protocol:
#     af recipe + info-weight ramp 1.0→3.0 over the run, both toys
#     (the diagnosis showed dips are G-side code→mode remaps; the ramp
#     makes migrating an established assignment expensive late).
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4c.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
run 1 10800 "full LOO x5 folds, agent-frame+social" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social \
    --out benchmarks/ethucy_timematched_loo_r4afsocial.json
run 2 7200 "small-toy 40k af+infosched(1->3) ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy small \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "loss_info_w_end": 3.0, "loss_info_w_steps": 40000}' \
    --out benchmarks/coverage_ensemble_r4_small40k_af_infosched.json
run 3 7200 "big-toy 40k af+infosched(1->3) ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy big \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "loss_info_w_end": 3.0, "loss_info_w_steps": 40000}' \
    --out benchmarks/coverage_ensemble_r4_big40k_af_infosched.json
echo "=== r4c done $(date)" | tee -a "$LOG"
