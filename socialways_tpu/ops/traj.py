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


def agent_frame_of(obsv_p: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Per-agent canonical (agent-centric) frame from an observation.

    Origin = the last observed point; +x axis = the last observed
    displacement (the agent's heading).  Zero displacement falls back to
    the identity rotation.  Returns ``(c, cos, sin)`` with shapes
    ``[..., 2], [...], [...]`` (leading dims = agent batch dims).

    This is the standard agent-centric canonicalization of the trajectory
    literature (no reference counterpart — the reference trains in world
    coordinates); with it the model sees every approach direction as the
    SAME problem, so a multimodal structure learned once is shared across
    conditions instead of re-learned per direction.
    """
    c = obsv_p[..., -1, :]
    d = obsv_p[..., -1, :] - obsv_p[..., -2, :]
    nrm = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    unit = jnp.where(nrm > 1e-8, d / jnp.maximum(nrm, 1e-8),
                     jnp.array([1.0, 0.0], d.dtype))
    return c, unit[..., 0], unit[..., 1]


def to_agent_frame(points: jnp.ndarray, frame) -> jnp.ndarray:
    """World → agent frame.  ``points [..., T, 2]`` against a frame whose
    members broadcast along the leading dims (extra leading axes on
    ``points`` — e.g. a K-sample axis — broadcast for free)."""
    c, cos, sin = frame
    q = points - c[..., None, :]
    x = q[..., 0] * cos[..., None] + q[..., 1] * sin[..., None]
    y = -q[..., 0] * sin[..., None] + q[..., 1] * cos[..., None]
    return jnp.stack([x, y], axis=-1)


def from_agent_frame_4d(states: jnp.ndarray, frame) -> jnp.ndarray:
    """Agent frame → world for 4-D rollout states ``[..., T, 4]``:
    positions rotate + translate, velocity components only rotate."""
    c, cos, sin = frame
    px, py = states[..., 0], states[..., 1]
    vx, vy = states[..., 2], states[..., 3]
    wx = px * cos[..., None] - py * sin[..., None] + c[..., None, 0]
    wy = px * sin[..., None] + py * cos[..., None] + c[..., None, 1]
    wvx = vx * cos[..., None] - vy * sin[..., None]
    wvy = vx * sin[..., None] + vy * cos[..., None]
    return jnp.stack([wx, wy, wvx, wvy], axis=-1)


def canonicalize_for_rollout(obsv_p: jnp.ndarray, agent_frame: bool,
                             use_social: bool):
    """THE agent_frame × use_social composition, in one place.

    Returns ``(obsv_in, frame, social_x4)``: the (possibly canonicalized)
    encoder/decoder input, the per-agent frame (None when ``agent_frame``
    is off — rollouts then need no un-mapping), and the WORLD-frame
    last-obs 4-D states for the pairwise social geometry (None unless
    both flags are on; distance/bearing/DCA are relational quantities
    that need one shared frame, so they are captured BEFORE
    canonicalization while the pooled h_j stay canonical — see
    models.generator.prepare_rollout).  Every consumer — gan_step,
    k_sample_rollout, crowd_simulate (both variants), diagnostics — must
    go through this helper: a hand-rolled copy drifted once already
    (round-3 advisor: simulate fed world coordinates to canonical-frame
    weights)."""
    if not agent_frame:
        return obsv_p, None, None
    social_x4 = obsv_to_4d(obsv_p)[:, -1] if use_social else None
    frame = agent_frame_of(obsv_p)
    return to_agent_frame(obsv_p, frame), frame, social_x4


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
