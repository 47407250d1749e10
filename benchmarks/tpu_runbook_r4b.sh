#!/bin/bash
# Round-4 queue B:
#  1-2. af×social synthetic-LOO A/B on the established hotel deep fold
#       (VERDICT-r3 #1): social alone and agent-frame+social, same
#       seed/protocol as the r3 af/ctrl artifacts (30k epochs).
#  3-5. Dip diagnosis (VERDICT-r3 #4): per-eval code→mode maps + D
#       margins + Q accuracy at 500-step cadence on seeds whose curves
#       dipped in the 8-seed runs (big af seeds 3,4; small af seed 7).
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4b.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
run 1 7200 "hotel 30k social-only arm" \
    python benchmarks/ethucy_timematched.py --fold hotel --epochs 30000 \
    --block 1000 --use-social \
    --out benchmarks/ethucy_timematched_hotel_r4social.json
run 2 7200 "hotel 30k agent-frame+social arm" \
    python benchmarks/ethucy_timematched.py --fold hotel --epochs 30000 \
    --block 1000 --agent-frame --use-social \
    --out benchmarks/ethucy_timematched_hotel_r4afsocial.json
run 3 7200 "dip diagnosis big af seed 3" \
    python benchmarks/dip_diagnosis.py --toy big --seed 3 --steps 40000 \
    --block 500 --out benchmarks/dip_diagnosis_r4_big_s3.json
run 4 7200 "dip diagnosis big af seed 4" \
    python benchmarks/dip_diagnosis.py --toy big --seed 4 --steps 40000 \
    --block 500 --out benchmarks/dip_diagnosis_r4_big_s4.json
run 5 7200 "dip diagnosis small af seed 7" \
    python benchmarks/dip_diagnosis.py --toy small --seed 7 --steps 40000 \
    --block 500 --out benchmarks/dip_diagnosis_r4_small_s7.json
echo "=== r4b done $(date)" | tee -a "$LOG"
