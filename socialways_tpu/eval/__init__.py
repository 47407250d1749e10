from socialways_tpu.eval.metrics import (
    EvalSums,
    eval_chunk,
    finalize_eval,
    k_sample_errors,
    k_sample_rollout,
)
from socialways_tpu.eval.stats import (
    calc_and_store_stats,
    compute_1nn,
    compute_wasserstein,
    load_real_samples,
)
from socialways_tpu.ops.traj import predict_cv

__all__ = [
    "EvalSums", "eval_chunk", "finalize_eval", "k_sample_errors",
    "k_sample_rollout", "predict_cv", "calc_and_store_stats", "compute_1nn",
    "compute_wasserstein", "load_real_samples",
]
