from socialways_tpu.ops.traj import get_traj_4d, obsv_to_4d, pred_to_4d, predict_cv
from socialways_tpu.ops.kalman import (
    kalman_filter,
    kalman_matrices,
    kalman_smooth,
    predict_kalman,
)
from socialways_tpu.ops.social import (
    attention_pool,
    scene_mask,
    social_features,
    social_pool,
)
from socialways_tpu.ops.lstm import lstm_cell, lstm_init, lstm_seq, zero_state
from socialways_tpu.ops.nn import (
    leaky_relu,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)

__all__ = [
    "get_traj_4d", "obsv_to_4d", "pred_to_4d", "predict_cv",
    "kalman_filter", "kalman_matrices", "kalman_smooth", "predict_kalman",
    "attention_pool", "scene_mask", "social_features", "social_pool",
    "lstm_cell", "lstm_init", "lstm_seq", "zero_state",
    "leaky_relu", "linear_apply", "linear_init", "mlp_apply", "mlp_init",
]
