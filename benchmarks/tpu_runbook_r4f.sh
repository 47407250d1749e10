#!/bin/bash
# Round-4 queue F:
#  1-2. af+social+ema coverage at the 8-seed protocol (both toys) — does
#       the EMA generator pin the flagship composition's one residual
#       big-toy non-1.000 seed (0.999) and push toy accuracy below the
#       af+ema record (0.006-0.009)?
#  3-4. The 5-fold synthetic LOO under the round-4 stabilizer levers:
#       (3) af+social+ema — does evaluating the EMA generator alone tame
#           the univ fold's late blowup (best 0.288 @4k, then 21.6)?
#       (4) af+social+ema+inoise (annealed D instance noise over the full
#           run) — the full documented-recipe stack on the LOO protocol.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4f.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
run 1 7200 "big-toy 40k af+social+ema ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy big \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "use_social": true, "g_ema_decay": 0.999}' \
    --out benchmarks/coverage_ensemble_r4_big40k_afsocial_ema.json
run 2 7200 "small-toy 40k af+social+ema ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy small \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "use_social": true, "g_ema_decay": 0.999}' \
    --out benchmarks/coverage_ensemble_r4_small40k_afsocial_ema.json
run 3 7200 "LOO all folds af+social+ema" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social \
    --overrides '{"g_ema_decay": 0.999}' \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_ema.json
run 4 7200 "LOO all folds af+social+ema+inoise" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social \
    --overrides '{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1}' \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_ema_inoise.json
echo "=== r4f done $(date)" | tee -a "$LOG"
