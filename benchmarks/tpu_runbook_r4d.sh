#!/bin/bash
# Round-4 queue D: does the paper's social attention compose with the
# coverage recipes on the toys?  (The LOO A/B showed af×social is the
# accuracy winner; this measures the COVERAGE axis at the 8-seed
# protocol.)  Toy scene batches share a start time, so social pooling
# sees the per-condition neighbor group.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4d.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
run 1 7200 "big-toy 40k af+social ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy big \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "use_social": true}' \
    --out benchmarks/coverage_ensemble_r4_big40k_afsocial.json
run 2 7200 "small-toy 40k af+social ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy small \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "use_social": true}' \
    --out benchmarks/coverage_ensemble_r4_small40k_afsocial.json
#  3-4. af + generator EMA: the dip diagnosis found LATE dips are
#  within-code ANGLE DRIFT (code map intact, Q acc 1.0, D margin ~0 —
#  a limit-cycle oscillation with no restoring force at equilibrium);
#  evaluating the EMA generator time-averages the oscillation out.
run 3 7200 "small-toy 40k af+ema0.999 ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy small \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "g_ema_decay": 0.999}' \
    --out benchmarks/coverage_ensemble_r4_small40k_af_ema.json
run 4 7200 "big-toy 40k af+ema0.999 ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy big \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "g_ema_decay": 0.999}' \
    --out benchmarks/coverage_ensemble_r4_big40k_af_ema.json
#  5. flagship-at-scale: agent-frame cost inside the fused crowd-sim
#     program at 131k agents (should be ~free — elementwise O(N))
run 5 3600 "crowd sim af A/B 131k agents" \
    python benchmarks/crowd_sim_af_ab.py --agents 131072 --windows 4 \
    --out benchmarks/crowd_sim_af_ab_r4.json
echo "=== r4d done $(date)" | tee -a "$LOG"
