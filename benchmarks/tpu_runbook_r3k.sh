#!/bin/bash
# Session-3 tail queue: af composition arms (the post-af global-collapse
# levers) -> crowd A/Bs -> eth-ucy agent-frame A/B -> remaining arms.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r3k.log
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
run 1 14400 "big-toy 40k af+ms / af+ds x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+af+ms,robust1+info2+inoise2+af+ds \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_afms.json
bash benchmarks/tpu_runbook_r3e.sh 2>&1 | tee -a "$LOG"
run 3 1800 "eth-ucy hotel 30k control" \
    python benchmarks/ethucy_timematched.py --dir /tmp/synthec --fold hotel \
    --epochs 30000 --block 2000 \
    --out benchmarks/ethucy_timematched_hotel_r3ctrl.json
run 4 1800 "eth-ucy hotel 30k agent-frame" \
    python benchmarks/ethucy_timematched.py --dir /tmp/synthec --fold hotel \
    --epochs 30000 --block 2000 --agent-frame \
    --out benchmarks/ethucy_timematched_hotel_r3af.json
run 5 14400 "big-toy 40k unroll2 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+unroll2 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_unroll2.json
run 6 14400 "big-toy 40k h128+codes6+bs768 x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2+h128,robust1+info2+inoise2+codes6,robust1+info2+inoise2+bs768 \
    --seeds 0,1,2 --toys big --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k_rest.json
echo "=== r3k done $(date)" | tee -a "$LOG"
