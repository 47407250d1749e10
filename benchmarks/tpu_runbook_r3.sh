#!/bin/bash
# Round-3 TPU run queue — executed sequentially (the chip is single-client)
# the moment the axon tunnel returns.  Each step writes its own artifact;
# a step failure does not block the next (the tunnel can flap).
#
# Usage: bash benchmarks/tpu_runbook_r3.sh [start_step]
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_runbook_r3.log
START=${1:-1}
run() {  # run <step> <timeout_s> <desc> <cmd...>
    local step=$1 to=$2 desc=$3; shift 3
    [ "$step" -lt "$START" ] && return 0
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}

# 1. refresh the TPU perf record (also rewrites bench_tpu_record.json)
run 1 3600 "bench.py live TPU record" python bench.py

# 2. MFU accounting on the real chip (VERDICT #3)
run 2 5400 "MFU accounting" python benchmarks/mfu.py --bf16 \
    --crowd-sizes 16384,131072 --out benchmarks/mfu_r3.json

# 3. decisive big-toy 80k anneal-horizon-matched arms, production path
#    (VERDICT #1; CPU pilot: final 0.86/0.73/0.86, last5 0.97/0.74/0.92)
run 3 21600 "big-toy 80k inoisefull x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoisefull --seeds 0,1,2 --toys big \
    --epochs 80000 --out benchmarks/coverage_robustness_r3_tpu_big80k.json

# 4. widen to 5 MORE seeds via the ensemble harness (one run of wall clock;
#    per-member divergence rescue mirrors cli train --auto-recover)
run 4 21600 "big-toy 80k ensemble x5 seeds" \
    python benchmarks/coverage_ensemble.py --toy big --seeds 3,4,5,6,7 \
    --steps 80000 --block 2000 --auto-recover \
    --overrides '{"loss_info_w": 2.0, "lr_d": 5e-4, "d_lr_decay_rate": 0.7, "d_lr_decay_steps": 10000, "d_input_noise": 0.05, "d_input_noise_steps": 80000}' \
    --out benchmarks/coverage_ensemble_r3_big80k_s34567.json

# 5. SN-GAN verdict on the TPU stream (VERDICT #7; CPU stream said negative)
run 5 14400 "SN small-toy TPU-stream confirm" \
    python benchmarks/coverage_robustness.py --recipes robust1+sn \
    --seeds 0,1,2 --toys small --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_sn_small.json

# 6. bf16 crowd-scale training headroom (VERDICT #5): 2M A/B + 4M attempt
run 6 14400 "crowd training bf16 2M/4M" \
    python benchmarks/crowd_training_scale.py \
    --sizes 2097152,4194304 --max-scene-size 64 --remat-steps \
    --grad-accum 8 --bf16 --steps 2 \
    --out benchmarks/crowd_training_bf16_r3.json

echo "=== runbook done $(date)" | tee -a "$LOG"
