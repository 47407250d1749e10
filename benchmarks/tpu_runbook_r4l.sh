#!/bin/bash
# Round-4 queue L: graced/capped rescue — does the new policy keep
# rescue's wins while fixing its thrash?
#  r4k measured (unbounded rescue, no grace): arm mean avg-ADE
#  0.0812 vs base 0.1008, worst seed 0.0967 vs 0.1515 — rescue wins —
#  but two thrash cells regressed (univ s3: 5 rescues -> 0.190;
#  zara1 s5: 4 rescues -> 0.084) and the log shows the post-rescue
#  transient re-firing the rescue mid-recovery (ineffective_streak 3).
#  --stall-grace 2 skips the transient evals; --stall-max-rescues 3
#  stops basin-less retries.
#  1-2. fresh seeds 6/7, graced+capped rescue (8-seed matrix tail).
#  3-4. thrash seeds 3/5 re-run graced+capped (direct A/B vs r4k).
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4l.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
OV='{"g_ema_decay": 0.999, "d_input_noise": 0.05, "d_input_noise_steps": -1, "d_input_noise_floor": 0.02}'
for S in 6 7 3 5; do
    run "$S" 7200 "LOO floor02 seed $S + graced/capped rescue" \
        python benchmarks/ethucy_timematched.py --fold all --epochs 30000 \
        --block 1000 --agent-frame --use-social --seed "$S" \
        --stall-blocks 5 --stall-grace 2 --stall-max-rescues 3 \
        --overrides "$OV" \
        --out "benchmarks/ethucy_timematched_loo_r4afsocial_ema_floor02_gresc_s$S.json"
done
echo "=== r4l done $(date)" | tee -a "$LOG"
