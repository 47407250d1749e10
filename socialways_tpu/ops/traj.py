"""Trajectory state ops.

Parity with the reference's 4-D state construction (train.py:130-138): a
trajectory of positions becomes (x, y, vx, vy) states where observed
velocities are backward differences with the first repeated, and predicted
velocities are differenced against the last observation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def obsv_to_4d(obsv_p: jnp.ndarray) -> jnp.ndarray:
    """[..., T, 2] positions → [..., T, 4] (pos, backward-diff vel); the
    first step repeats the second's velocity (train.py:131-133)."""
    v = obsv_p[..., 1:, :] - obsv_p[..., :-1, :]
    v = jnp.concatenate([v[..., :1, :], v], axis=-2)
    return jnp.concatenate([obsv_p, v], axis=-1)


def pred_to_4d(obsv_p: jnp.ndarray, pred_p: jnp.ndarray) -> jnp.ndarray:
    """Future positions → 4-D states, velocity diffed against the previous
    future position (or the last observation for the first step,
    train.py:135-137)."""
    prev = jnp.concatenate([obsv_p[..., -1:, :], pred_p[..., :-1, :]], axis=-2)
    v = pred_p - prev
    return jnp.concatenate([pred_p, v], axis=-1)


def get_traj_4d(obsv_p: jnp.ndarray, pred_p: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, ...]:
    if pred_p is None:
        return obsv_to_4d(obsv_p)
    return obsv_to_4d(obsv_p), pred_to_4d(obsv_p, pred_p)


def predict_cv(obsv: jnp.ndarray, n_next: int) -> jnp.ndarray:
    """Constant-velocity baseline (reference utils/linear_models.py:9-20):
    v = (p[-1] - p[-3]) / 2 when possible, else a single diff; extrapolate
    ``n_next`` steps.  [..., T, 2] → [..., n_next, 2]."""
    n_past = obsv.shape[-2]
    if n_past > 2:
        vel = (obsv[..., -1, :] - obsv[..., -3, :]) / 2.0
    else:
        vel = obsv[..., -1, :] - obsv[..., -2, :]
    steps = jnp.arange(1, n_next + 1, dtype=obsv.dtype)
    return (obsv[..., -1:, :]
            + steps[..., :, None] * vel[..., None, :])
