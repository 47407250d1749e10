"""bfloat16 mixed-precision path: forward math in bf16 (f32 accumulation),
master params / losses / optimizer in float32.

The float32 default path must be bit-identical to the pre-mixed-precision
code (covered by the golden + torch-parity suites); these tests pin down the
bf16 behavior: close-to-f32 outputs, f32 state preserved through a train
step, and finite losses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from socialways_tpu.config import TrainConfig
from socialways_tpu.engine import gan_step, init_train_state
from socialways_tpu.eval.metrics import eval_chunk
from socialways_tpu.models.generator import generator_rollout, init_generator

CFG = TrainConfig(hidden_size=32, social_feature_size=32, noise_len=16,
                  n_past=4, n_next=4, batch_size=64, n_unrolling_steps=1,
                  use_social=True)
BF16 = CFG.replace(compute_dtype="bfloat16")


def _cast(tree, dt):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _batch(n=16, n_scenes=2, key=0):
    rng = np.random.RandomState(key)
    ids = (np.arange(n) * n_scenes // n).astype(np.int32)
    return {
        "obsvs": jnp.asarray(rng.rand(n, CFG.n_past, 2).astype(np.float32)),
        "preds": jnp.asarray(rng.rand(n, CFG.n_next, 2).astype(np.float32)),
        "scene_ids": jnp.asarray(ids),
        "valid": jnp.ones(n, bool),
    }


def test_bf16_rollout_close_to_f32():
    params = init_generator(jax.random.PRNGKey(0), CFG)
    b = _batch()
    noise = jax.random.uniform(jax.random.PRNGKey(1), (16, CFG.noise_len))
    f32 = generator_rollout(params, b["obsvs"], noise, CFG.n_next,
                            b["scene_ids"], use_social=True)
    bf = generator_rollout(_cast(params, jnp.bfloat16),
                           b["obsvs"].astype(jnp.bfloat16),
                           noise.astype(jnp.bfloat16), CFG.n_next,
                           b["scene_ids"], use_social=True)
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(bf, np.float32),
                               np.asarray(f32), atol=0.05)


def test_bf16_gan_step_keeps_f32_master_state():
    state = init_train_state(jax.random.PRNGKey(0), BF16)
    new_state, m = jax.jit(lambda s, b, r: gan_step(s, b, r, BF16))(
        state, _batch(), jax.random.PRNGKey(1))
    for leaf in jax.tree_util.tree_leaves(new_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(float(m.d_loss)) and np.isfinite(float(m.g_loss))
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.g_params, new_state.g_params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_bf16_gan_step_tracks_f32_dynamics():
    """One bf16 step from the same init lands near the f32 step (the rounding
    perturbation is small relative to the update)."""
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    b = _batch()
    r = jax.random.PRNGKey(1)
    s_f32, m_f32 = gan_step(state, b, r, CFG)
    s_bf, m_bf = gan_step(state, b, r, BF16)
    np.testing.assert_allclose(float(m_bf.d_loss), float(m_f32.d_loss),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(float(m_bf.g_loss), float(m_f32.g_loss),
                               rtol=0.05, atol=0.02)


def test_bf16_eval_chunk_close_to_f32():
    params = init_generator(jax.random.PRNGKey(0), CFG)
    b = _batch()
    r = jax.random.PRNGKey(2)
    e_f32 = eval_chunk(params, b, r, 8, CFG)
    e_bf = eval_chunk(params, b, r, 8, BF16)
    np.testing.assert_allclose(float(e_bf.ade_avg), float(e_f32.ade_avg),
                               rtol=0.05, atol=0.02)
    assert int(e_bf.n_samples) == int(e_f32.n_samples)


def test_bf16_grad_accum_matches_full_batch():
    """--bf16 composes with --grad-accum (the crowd-scale memory recipe:
    bf16 chunk compute halves the live micro-chunk residuals).  Chunks are
    scene-aligned so per-row forward math is identical; loss reductions and
    gradient accumulation stay f32 — accum == full-batch to f32-reduction
    tolerance even with a padded tail."""
    cfg = BF16.replace(n_unrolling_steps=1)
    cfg_a = cfg.replace(grad_accum=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _batch(n=16, key=3)
    valid = np.asarray(batch["valid"]).copy()
    valid[14:] = False
    ids = np.asarray(batch["scene_ids"]).copy()
    ids[14:] = -1
    batch["valid"], batch["scene_ids"] = jnp.asarray(valid), jnp.asarray(ids)
    rng = jax.random.PRNGKey(6)
    s_full, m_full = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)
    s_acc, m_acc = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_a))(
        state, batch, rng)
    np.testing.assert_allclose(float(m_acc.g_loss), float(m_full.g_loss),
                               rtol=2e-3)
    np.testing.assert_allclose(float(m_acc.d_loss), float(m_full.d_loss),
                               rtol=2e-3)
    for tree_a, tree_b in ((s_acc.g_params, s_full.g_params),
                           (s_acc.d_params, s_full.d_params)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-3, atol=5e-5),
            tree_a, tree_b)
