"""Agent-centric canonical frames (cfg.agent_frame).

The transform is our extension (no reference counterpart — the reference
trains in world coordinates, train.py:130-138 builds world-frame states);
these tests pin the properties the feature's value rests on: exact
round-trip, rotation equivariance of the full model, and loss invariance
of the training step under global isometries of the data.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from socialways_tpu.config import TrainConfig
from socialways_tpu.engine import gan_step, init_train_state
from socialways_tpu.engine.train_step import eval_params
from socialways_tpu.eval.metrics import k_sample_rollout
from socialways_tpu.ops.traj import (agent_frame_of, from_agent_frame_4d,
                                     to_agent_frame)

CFG = TrainConfig(hidden_size=32, social_feature_size=32, noise_len=16,
                  n_past=4, n_next=3, batch_size=8, n_unrolling_steps=1,
                  agent_frame=True)


def _rand_traj(n=6, t=4, key=0):
    rng = np.random.RandomState(key)
    return jnp.asarray(rng.randn(n, t, 2).astype(np.float32))


def _rot(points, theta, shift):
    c, s = np.cos(theta), np.sin(theta)
    r = jnp.asarray([[c, -s], [s, c]], jnp.float32)
    return points @ r.T + jnp.asarray(shift, jnp.float32)


def test_round_trip_identity():
    obsv = _rand_traj()
    pred = _rand_traj(key=1)
    frame = agent_frame_of(obsv)
    pred_c = to_agent_frame(pred, frame)
    # rebuild a 4d state in the canonical frame and map it back
    vel_c = jnp.diff(jnp.concatenate([to_agent_frame(obsv, frame)[:, -1:],
                                      pred_c], axis=1), axis=1)
    back = from_agent_frame_4d(jnp.concatenate([pred_c, vel_c], -1), frame)
    np.testing.assert_allclose(np.asarray(back[..., :2]),
                               np.asarray(pred), rtol=1e-5, atol=1e-5)


def test_canonical_obsv_is_heading_aligned():
    obsv = _rand_traj()
    frame = agent_frame_of(obsv)
    can = to_agent_frame(obsv, frame)
    # last point at the origin, last displacement along +x
    np.testing.assert_allclose(np.asarray(can[:, -1]), 0.0, atol=1e-6)
    d = np.asarray(can[:, -1] - can[:, -2])
    np.testing.assert_allclose(d[:, 1], 0.0, atol=1e-5)
    assert (d[:, 0] > 0).all()


def test_rollout_rotation_equivariance():
    """model(R·obsv) == R·model(obsv) under agent_frame — the property
    that makes per-condition collapse structurally impossible."""
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    obsv = _rand_traj()
    ids = jnp.zeros((obsv.shape[0],), jnp.int32)
    rng = jax.random.PRNGKey(3)
    base = k_sample_rollout(eval_params(state), obsv, ids, rng, 4, CFG)
    theta, shift = 1.1, (0.7, -2.0)
    rot = k_sample_rollout(eval_params(state), _rot(obsv, theta, shift),
                           ids, rng, 4, CFG)
    np.testing.assert_allclose(np.asarray(rot[..., :2]),
                               np.asarray(_rot(base[..., :2], theta, shift)),
                               rtol=2e-4, atol=2e-4)


def test_gan_step_loss_invariant_under_isometry():
    """Canonical-frame training sees identical data before/after a global
    rotation+translation, so the step metrics match exactly."""
    state = init_train_state(jax.random.PRNGKey(1), CFG)
    obsv, pred = _rand_traj(n=8), _rand_traj(n=8, t=3, key=2)
    batch = {"obsvs": obsv, "preds": pred,
             "scene_ids": jnp.zeros((8,), jnp.int32),
             "valid": jnp.ones((8,), bool)}
    rng = jax.random.PRNGKey(7)
    _, m0 = gan_step(state, batch, rng, CFG)
    batch_r = dict(batch, obsvs=_rot(obsv, 0.9, (3.0, -1.0)),
                   preds=_rot(pred, 0.9, (3.0, -1.0)))
    _, m1 = gan_step(state, batch_r, rng, CFG)
    np.testing.assert_allclose(float(m0.g_loss), float(m1.g_loss),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m0.d_loss), float(m1.d_loss),
                               rtol=1e-4)


def test_agent_frame_rejects_social():
    cfg = CFG.replace(use_social=True)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = {"obsvs": _rand_traj(n=8), "preds": _rand_traj(n=8, t=3, key=2),
             "scene_ids": jnp.zeros((8,), jnp.int32),
             "valid": jnp.ones((8,), bool)}
    with pytest.raises(ValueError, match="agent_frame"):
        gan_step(state, batch, jax.random.PRNGKey(0), cfg)


def test_zero_displacement_falls_back_to_identity():
    obsv = jnp.zeros((3, 4, 2), jnp.float32)   # stationary agents
    frame = agent_frame_of(obsv)
    can = to_agent_frame(obsv, frame)
    assert np.isfinite(np.asarray(can)).all()
    np.testing.assert_allclose(np.asarray(can), 0.0, atol=1e-6)
