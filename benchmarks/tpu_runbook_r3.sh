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

# 3. THE BAR (VERDICT #1): the documented big-toy recipe
#    (robust1+info2+inoise2, 40k run = its anneal horizon) x3 seeds,
#    mean-of-last-5 scored (the runner records it).  Round-2 finals were
#    1.00/0.86/0.95 — the question is whether last5 scoring puts the
#    worst seed over 0.9.
run 3 14400 "big-toy 40k inoise2 x3 seeds (the documented recipe)" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoise2 --seeds 0,1,2 --toys big \
    --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_big40k.json

# 4. widen the SAME recipe to 5 more seeds via the ensemble harness (one
#    run of wall clock; per-member divergence rescue mirrors --auto-recover)
run 4 14400 "big-toy 40k ensemble x5 extra seeds" \
    python benchmarks/coverage_ensemble.py --toy big --seeds 3,4,5,6,7 \
    --steps 40000 --block 2000 --auto-recover \
    --overrides '{"loss_info_w": 2.0, "lr_d": 5e-4, "d_lr_decay_rate": 0.7, "d_lr_decay_steps": 10000, "d_input_noise": 0.05, "d_input_noise_steps": 40000}' \
    --out benchmarks/coverage_ensemble_r3_big40k_s34567.json

# 5. long-run form: 80k with the anneal matched to the run + keep-clock
#     rescue (the intended recipe for runs past the horizon)
run 5 21600 "big-toy 80k inoisefull + keep-clock rescue x3 seeds" \
    python benchmarks/coverage_robustness.py \
    --recipes robust1+info2+inoisefull,robust1+info2+inoise2+rescue \
    --seeds 0,1,2 --toys big --epochs 80000 \
    --out benchmarks/coverage_robustness_r3_tpu_big80k.json

# 6. SN-GAN verdict on the TPU stream (VERDICT #7; CPU stream said negative)
run 6 14400 "SN small-toy TPU-stream confirm" \
    python benchmarks/coverage_robustness.py --recipes robust1+sn \
    --seeds 0,1,2 --toys small --epochs 40000 \
    --out benchmarks/coverage_robustness_r3_tpu_sn_small.json

# 7. bf16 crowd-scale training headroom (VERDICT #5): 2M A/B + 4M attempt
run 7 14400 "crowd training bf16 2M/4M" \
    python benchmarks/crowd_training_scale.py \
    --sizes 2097152,4194304 --max-scene-size 64 --remat-steps \
    --grad-accum 8 --bf16 --steps 2 \
    --out benchmarks/crowd_training_bf16_r3.json

echo "=== runbook done $(date)" | tee -a "$LOG"
