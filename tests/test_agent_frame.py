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


# ---- agent_frame × use_social composition -------------------------------
# Design (models/generator.py:prepare_rollout): the pairwise social
# geometry (distance/bearing/DCA, train.py:192-241) is computed from
# WORLD-frame last-obs states; the attention pools CANONICAL encoder
# states h_j.  Both ingredients are invariant under global isometries, so
# the composed model keeps the equivariance that makes agent frames work.

CFG_SOC = CFG.replace(use_social=True)


def test_social_composition_gan_step_runs():
    """agent_frame + use_social trains (the round-3 hard ValueError is
    gone) and stays loss-invariant under global isometries."""
    state = init_train_state(jax.random.PRNGKey(1), CFG_SOC)
    obsv, pred = _rand_traj(n=8), _rand_traj(n=8, t=3, key=2)
    ids = jnp.asarray([0, 0, 0, 1, 1, 2, 2, 2], jnp.int32)
    batch = {"obsvs": obsv, "preds": pred, "scene_ids": ids,
             "valid": jnp.ones((8,), bool)}
    rng = jax.random.PRNGKey(7)
    _, m0 = gan_step(state, batch, rng, CFG_SOC)
    assert np.isfinite(float(m0.g_loss)) and np.isfinite(float(m0.d_loss))
    batch_r = dict(batch, obsvs=_rot(obsv, 0.9, (3.0, -1.0)),
                   preds=_rot(pred, 0.9, (3.0, -1.0)))
    _, m1 = gan_step(state, batch_r, rng, CFG_SOC)
    np.testing.assert_allclose(float(m0.g_loss), float(m1.g_loss),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m0.d_loss), float(m1.d_loss),
                               rtol=1e-4)


def test_social_composition_rollout_equivariance():
    """model(R·scene) == R·model(scene) with BOTH flags on — neighbors
    included, so the world-frame social geometry must be isometry-
    invariant for this to hold."""
    state = init_train_state(jax.random.PRNGKey(0), CFG_SOC)
    obsv = _rand_traj()
    ids = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    rng = jax.random.PRNGKey(3)
    base = k_sample_rollout(eval_params(state), obsv, ids, rng, 4, CFG_SOC)
    theta, shift = 1.1, (0.7, -2.0)
    rot = k_sample_rollout(eval_params(state), _rot(obsv, theta, shift),
                           ids, rng, 4, CFG_SOC)
    np.testing.assert_allclose(np.asarray(rot[..., :2]),
                               np.asarray(_rot(base[..., :2], theta, shift)),
                               rtol=2e-4, atol=2e-4)


def test_social_geometry_is_world_frame_oracle():
    """The composed social context == attention pooling of WORLD-frame
    pairwise features over CANONICAL hidden states, built by hand from
    the ops/ reference pieces."""
    from socialways_tpu.models.generator import (encode_observation,
                                                 init_generator,
                                                 prepare_rollout)
    from socialways_tpu.ops.nn import mlp_apply
    from socialways_tpu.ops.social import (attention_pool, scene_mask,
                                           social_features)
    from socialways_tpu.ops.traj import obsv_to_4d

    params = init_generator(jax.random.PRNGKey(5), CFG_SOC)
    obsv = _rand_traj()
    ids = jnp.asarray([0, 0, 0, 0, 1, 1], jnp.int32)
    frame = agent_frame_of(obsv)
    obsv_c = to_agent_frame(obsv, frame)
    world_x4 = obsv_to_4d(obsv)[:, -1]

    h, _ = encode_observation(params, obsv_to_4d(obsv_c))
    f_emb = mlp_apply(params["feat_mlp"], social_features(world_x4))
    s_oracle = attention_pool(params["attn_w"], f_emb, h, scene_mask(ids))

    prep = prepare_rollout(params, obsv_c, ids, use_social=True,
                           social_states=world_x4)
    np.testing.assert_allclose(np.asarray(prep[2]), np.asarray(s_oracle),
                               rtol=1e-5, atol=1e-6)


def test_social_composition_singletons_match_af_only():
    """Singleton scenes have no neighbors → zero social context → the
    composed rollout equals the agent-frame-only rollout exactly."""
    state = init_train_state(jax.random.PRNGKey(2), CFG_SOC)
    obsv = _rand_traj()
    ids = jnp.arange(obsv.shape[0], dtype=jnp.int32)   # all singletons
    rng = jax.random.PRNGKey(11)
    with_soc = k_sample_rollout(eval_params(state), obsv, ids, rng, 3,
                                CFG_SOC)
    without = k_sample_rollout(eval_params(state), obsv, ids, rng, 3,
                               CFG_SOC.replace(use_social=False))
    np.testing.assert_allclose(np.asarray(with_soc), np.asarray(without),
                               rtol=1e-6, atol=1e-6)


def test_social_composition_grad_accum_parity():
    """agent_frame + use_social + grad_accum: the chunked step equals the
    full-batch step (world-frame social states must chunk row-aligned).
    Scene boundaries align with the chunk split (4 rows/chunk)."""
    cfg = CFG_SOC.replace(grad_accum=2)
    state = init_train_state(jax.random.PRNGKey(4), CFG_SOC)
    obsv, pred = _rand_traj(n=8), _rand_traj(n=8, t=3, key=2)
    ids = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3], jnp.int32)
    batch = {"obsvs": obsv, "preds": pred, "scene_ids": ids,
             "valid": jnp.ones((8,), bool)}
    rng = jax.random.PRNGKey(9)
    s_full, m_full = gan_step(state, batch, rng, CFG_SOC)
    s_acc, m_acc = gan_step(state, batch, rng, cfg)
    np.testing.assert_allclose(float(m_full.g_loss), float(m_acc.g_loss),
                               rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5),
        s_full.g_params, s_acc.g_params)


def test_crowd_simulate_agent_frame_equivariance():
    """crowd_simulate under cfg.agent_frame canonicalizes each window and
    maps back (round-3 advisor fix: it used to feed world coordinates to
    canonical-frame weights) — so the whole autoregressive simulation is
    equivariant under global isometries, social attention included."""
    from socialways_tpu.engine.simulate import crowd_simulate

    cfg = CFG_SOC
    state = init_train_state(jax.random.PRNGKey(3), cfg)
    obsv0 = _rand_traj(n=6, t=4)
    ids = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    rng = np.random.RandomState(2)
    noise = jnp.asarray(
        rng.rand(2, 6, cfg.noise_len).astype(np.float32))  # 2 windows

    base = crowd_simulate(eval_params(state), obsv0, ids, 2,
                          jax.random.PRNGKey(0), cfg, noise=noise)
    theta, shift = 0.8, (2.0, -1.5)
    rot = crowd_simulate(eval_params(state), _rot(obsv0, theta, shift),
                         ids, 2, jax.random.PRNGKey(0), cfg, noise=noise)
    np.testing.assert_allclose(np.asarray(rot),
                               np.asarray(_rot(base, theta, shift)),
                               rtol=2e-4, atol=2e-4)


def test_zero_displacement_falls_back_to_identity():
    obsv = jnp.zeros((3, 4, 2), jnp.float32)   # stationary agents
    frame = agent_frame_of(obsv)
    can = to_agent_frame(obsv, frame)
    assert np.isfinite(np.asarray(can)).all()
    np.testing.assert_allclose(np.asarray(can), 0.0, atol=1e-6)
