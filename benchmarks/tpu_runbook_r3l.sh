#!/bin/bash
# Session-3 tail queue rev 2: the info-1.0 agent-frame recipe scored
# last5 0.998/1.000/1.000 — widen it to seeds 3-7 (8-seed protocol),
# then the crowd A/Bs, then the eth-ucy agent-frame A/B.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r3l.log
WAIT_PID=${1:-0}
if [ "$WAIT_PID" -gt 0 ]; then
    echo "=== waiting for pid $WAIT_PID" | tee -a "$LOG"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "=== pid $WAIT_PID done $(date +%H:%M:%S)" | tee -a "$LOG"
    sleep 60
fi
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
run 1 14400 "big-toy 40k inoise2+af ensemble x5 extra seeds" \
    python benchmarks/coverage_ensemble.py --toy big --seeds 3,4,5,6,7 \
    --steps 40000 --block 2000 --auto-recover \
    --overrides '{"loss_info_w": 1.0, "lr_d": 5e-4, "d_lr_decay_rate": 0.7, "d_lr_decay_steps": 10000, "d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true}' \
    --out benchmarks/coverage_ensemble_r3_big40k_af_s34567.json
bash benchmarks/tpu_runbook_r3e.sh 2>&1 | tee -a "$LOG"
run 3 1800 "eth-ucy hotel 30k control" \
    python benchmarks/ethucy_timematched.py --dir /tmp/synthec --fold hotel \
    --epochs 30000 --block 2000 \
    --out benchmarks/ethucy_timematched_hotel_r3ctrl.json
run 4 1800 "eth-ucy hotel 30k agent-frame" \
    python benchmarks/ethucy_timematched.py --dir /tmp/synthec --fold hotel \
    --epochs 30000 --block 2000 --agent-frame \
    --out benchmarks/ethucy_timematched_hotel_r3af.json
run 5 14400 "big-toy 40k unroll2+h128+codes6 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+unroll2,robust1+info2+inoise2+h128,robust1+info2+inoise2+codes6 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_rest.json
echo "=== r3l done $(date)" | tee -a "$LOG"
