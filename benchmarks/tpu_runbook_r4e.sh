#!/bin/bash
# Round-4 queue E: RE-RUN of the af+social coverage arms under the
# corrected coverage eval — the first run pooled eval-time social
# attention over one giant scene (zeros scene ids); the ensemble
# coverage eval now uses the dataset's real test scene structure
# (data.dataset.scene_ids_for_rows).  Artifacts intentionally overwrite
# the r4d outputs (same filenames): only the corrected numbers are
# citable.
set -u
cd /root/repo
LOG=benchmarks/tpu_runbook_r4e.log
run() {
    local step=$1 to=$2 desc=$3; shift 3
    echo "=== [$(date +%H:%M:%S)] step $step: $desc" | tee -a "$LOG"
    timeout "$to" "$@" >>"$LOG" 2>&1
    echo "--- step $step rc=$?" | tee -a "$LOG"
}
run 1 7200 "big-toy 40k af+social ensemble x8 seeds (corrected eval ids)" \
    python benchmarks/coverage_ensemble.py --toy big \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "use_social": true}' \
    --out benchmarks/coverage_ensemble_r4_big40k_afsocial.json
run 2 7200 "small-toy 40k af+social ensemble x8 seeds (corrected eval ids)" \
    python benchmarks/coverage_ensemble.py --toy small \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "use_social": true}' \
    --out benchmarks/coverage_ensemble_r4_small40k_afsocial.json
run 3 7200 "big-toy 40k af+social+infosched ensemble x8 seeds" \
    python benchmarks/coverage_ensemble.py --toy big \
    --seeds 0,1,2,3,4,5,6,7 --steps 40000 --block 2000 --auto-recover \
    --overrides '{"d_input_noise": 0.05, "d_input_noise_steps": 40000, "agent_frame": true, "use_social": true, "loss_info_w_end": 3.0, "loss_info_w_steps": 40000}' \
    --out benchmarks/coverage_ensemble_r4_big40k_afsocial_infosched.json
echo "=== r4e done $(date)" | tee -a "$LOG"
