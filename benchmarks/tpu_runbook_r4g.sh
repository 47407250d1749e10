#!/bin/bash
# Round-4 queue G: isolate the constant-D-instance-noise discovery.
#
# r4f's step-4 arm accidentally trained with CONSTANT sigma=0.05 noise
# (the -1 anneal sentinel resolved only in cli train at the time) and
# CURED the univ late divergence while setting the best LOO avg on
# record (0.0886/0.093).  Two arms to complete the A/B:
#  1. af+social+const-inoise WITHOUT ema — is the noise the whole fix,
#     or does it need the EMA generator?
#  2. af+social+ema+ANNEALED inoise (the r4f step-4 original intent,
#     now that Trainer resolves -1 everywhere) — does the cure survive
#     the noise annealing to zero by run end, or is the constant floor
#     load-bearing?
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4g.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
run 1 7200 "LOO af+social+const-inoise (no ema)" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social \
    --overrides '{"d_input_noise": 0.05}' \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_constinoise.json
run 2 7200 "LOO af+social+ema+annealed-inoise (fixed sentinel)" \
    python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
    --block 1000 --agent-frame --use-social \
    --overrides '{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1}' \
    --out benchmarks/ethucy_timematched_loo_r4afsocial_ema_annealinoise.json
echo "=== r4g done $(date)" | tee -a "$LOG"
