"""Engine tests: masked losses, GAN step mechanics, toy end-to-end training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from socialways_tpu.config import TrainConfig
from socialways_tpu.data.dataset import load_npz_dataset
from socialways_tpu.engine import Trainer, gan_step, init_train_state
from socialways_tpu.engine.losses import masked_mse, variety_loss

CFG = TrainConfig(hidden_size=32, social_feature_size=32, noise_len=16,
                  n_past=2, n_next=2, batch_size=64, n_unrolling_steps=1)


def _batch(n=8, n_scenes=2, n_valid=None, key=0):
    rng = np.random.RandomState(key)
    n_valid = n if n_valid is None else n_valid
    ids = np.full(n, -1, np.int32)
    ids[:n_valid] = np.arange(n_valid) % n_scenes
    return {
        "obsvs": jnp.asarray(rng.rand(n, CFG.n_past, 2).astype(np.float32)),
        "preds": jnp.asarray(rng.rand(n, CFG.n_next, 2).astype(np.float32)),
        "scene_ids": jnp.asarray(np.sort(ids)[::-1].copy()),
        "valid": jnp.asarray(ids != -1)[jnp.argsort(-jnp.asarray(ids))],
    }


# ------------------------------------------------------------- losses
def test_masked_mse_equals_full_mse_when_all_valid():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(5, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(5, 3).astype(np.float32))
    full = float(jnp.mean((a - b) ** 2))
    got = float(masked_mse(a, b, jnp.ones(5, bool)))
    assert got == pytest.approx(full, rel=1e-6)


def test_masked_mse_ignores_padding():
    a = jnp.asarray([[1.0], [100.0]])
    b = jnp.asarray([[0.0], [0.0]])
    v = jnp.asarray([True, False])
    assert float(masked_mse(a, b, v)) == pytest.approx(1.0)


def test_variety_loss_min_over_k():
    pred = jnp.zeros((2, 3, 2))
    k0 = jnp.ones((2, 3, 2))          # mse 1 per sample
    k1 = jnp.zeros((2, 3, 2))         # perfect
    pk = jnp.stack([k0, k1])
    assert float(variety_loss(pk, pred, jnp.ones(2, bool))) == 0.0


# ------------------------------------------------------------ gan step
def test_gan_step_updates_both_players():
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    new_state, m = jax.jit(lambda s, b, r: gan_step(s, b, r, CFG))(
        state, batch, jax.random.PRNGKey(1))
    # params actually moved
    g_delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.g_params,
                               state.g_params), 0.0)
    d_delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.d_params,
                               state.d_params), 0.0)
    assert g_delta > 0 and d_delta > 0
    assert np.isfinite(float(m.d_loss)) and np.isfinite(float(m.g_loss))
    assert int(m.n_samples) == 8


def test_gan_step_fully_padded_chunk_is_noop():
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _batch(n_valid=0)
    batch["valid"] = jnp.zeros(8, bool)
    batch["scene_ids"] = jnp.full((8,), -1, jnp.int32)
    new_state, m = gan_step(state, batch, jax.random.PRNGKey(1), CFG)
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), new_state.g_params,
        state.g_params))
    assert same
    assert int(m.n_samples) == 0


def test_gan_step_padding_invariance():
    """Adding padded rows must not change the update of valid samples."""
    cfg = CFG.replace(n_unrolling_steps=0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    b8 = _batch(n=8, n_valid=8, key=3)

    # same batch with 4 junk rows appended (marked invalid)
    rng = np.random.RandomState(99)
    b12 = {
        "obsvs": jnp.concatenate(
            [b8["obsvs"], jnp.asarray(rng.rand(4, CFG.n_past, 2)
                                      .astype(np.float32))]),
        "preds": jnp.concatenate(
            [b8["preds"], jnp.asarray(rng.rand(4, CFG.n_next, 2)
                                      .astype(np.float32))]),
        "scene_ids": jnp.concatenate(
            [b8["scene_ids"], jnp.full((4,), -1, jnp.int32)]),
        "valid": jnp.concatenate([b8["valid"], jnp.zeros(4, bool)]),
    }
    # use identical per-sample noise: force by same rng key; noise shape
    # differs (8 vs 12 rows) so compare losses only qualitatively — instead
    # verify metrics: valid-sample error sums are computed over valid only
    _, m8 = gan_step(state, b8, jax.random.PRNGKey(7), cfg)
    _, m12 = gan_step(state, b12, jax.random.PRNGKey(7), cfg)
    assert int(m8.n_samples) == int(m12.n_samples) == 8


def test_unroll_restore_modes():
    batch = _batch()
    for mode in ("full", "reference", "none"):
        cfg = CFG.replace(d_restore=mode, n_unrolling_steps=2)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        new_state, _ = gan_step(state, batch, jax.random.PRNGKey(1), cfg)
        assert np.isfinite(
            float(jnp.abs(new_state.d_params["classifier"][0]["w"]).sum()))


def test_gan_step_variety_and_l2():
    cfg = CFG.replace(use_l2_loss=True, use_variety_loss=True, variety_k=3)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    new_state, m = gan_step(state, _batch(), jax.random.PRNGKey(1), cfg)
    assert np.isfinite(float(m.g_loss))


# --------------------------------------------------------------- trainer
@pytest.fixture(scope="module")
def toy_ds(tmp_path_factory):
    from socialways_tpu.data.toy import make_toy_npz_arrays
    p = tmp_path_factory.mktemp("toy") / "toy.npz"
    np.savez(p, **make_toy_npz_arrays())
    return load_npz_dataset(str(p))


def test_trainer_epoch_and_eval(toy_ds):
    cfg = TrainConfig(hidden_size=32, social_feature_size=32, noise_len=16,
                      batch_size=64, n_unrolling_steps=1, seed=0)
    tr = Trainer(cfg, toy_ds)
    state = tr.init_state()
    rng = jax.random.PRNGKey(0)
    state, metrics = tr.train_epoch(state, rng)
    assert metrics["train_ade"] > 0 and np.isfinite(metrics["train_ade"])
    ev = tr.evaluate(state, jax.random.PRNGKey(1), n_gen_samples=4)
    assert ev["ade_min"] <= ev["ade_avg"]
    assert ev["fde_min"] <= ev["fde_avg"]


def test_trainer_epoch_on_device_matches_host_loop(toy_ds):
    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      batch_size=64, n_unrolling_steps=0, seed=0)
    tr_dev = Trainer(cfg, toy_ds)
    tr_host = Trainer(cfg.replace(epoch_on_device=False), toy_ds)
    s0 = tr_dev.init_state()
    rng = jax.random.PRNGKey(3)
    s_dev, m_dev = tr_dev.train_epoch(s0, rng)
    s_host, m_host = tr_host.train_epoch(s0, rng)
    assert m_dev["train_ade"] == pytest.approx(m_host["train_ade"], rel=1e-4)
    w_dev = np.asarray(s_dev.g_params["embed"]["w"])
    w_host = np.asarray(s_host.g_params["embed"]["w"])
    np.testing.assert_allclose(w_dev, w_host, rtol=1e-4, atol=1e-6)


def test_toy_training_improves(toy_ds):
    """Training on the toy set must cut ADE far below init — the e2e
    learning sanity the reference validates visually (README.md:37-42).
    L2+GAN at lr 1e-3 drives toy ADE 0.98 → ~0.12 in 150 epochs (~10 s on
    CPU; each epoch is one fused device program)."""
    cfg = TrainConfig(hidden_size=32, social_feature_size=32, noise_len=16,
                      batch_size=256, n_unrolling_steps=1, seed=1,
                      use_l2_loss=True, lr_g=1e-3)
    tr = Trainer(cfg, toy_ds)
    state = tr.init_state()
    first = None
    rng = jax.random.PRNGKey(0)
    for epoch in range(150):
        rng, sub = jax.random.split(rng)
        state, m = tr.train_epoch(state, sub)
        if first is None:
            first = m["train_ade"]
    assert m["train_ade"] < first * 0.3, (first, m["train_ade"])


def test_gan_step_deterministic_under_fixed_key():
    """Same state + batch + key → bit-identical updates (the reference has
    no determinism story; ours is exact under fixed PRNG keys)."""
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _batch(key=11)
    s1, m1 = gan_step(state, batch, jax.random.PRNGKey(42), CFG)
    s2, m2 = gan_step(state, batch, jax.random.PRNGKey(42), CFG)
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1.g_loss) == float(m2.g_loss)
    # different key → different update
    s3, _ = gan_step(state, batch, jax.random.PRNGKey(43), CFG)
    diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, s1.g_params, s3.g_params),
        0.0)
    assert diff > 0


def test_checkpoint_resume_continues_identically(toy_ds, tmp_path):
    """Stop/restore mid-training → identical subsequent epoch (full-pytree
    checkpoint incl. optimizer state and RNG)."""
    import jax as _jax
    from socialways_tpu.io.checkpoint import (restore_checkpoint,
                                              save_checkpoint)

    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      batch_size=64, n_unrolling_steps=1, seed=5)
    tr = Trainer(cfg, toy_ds)
    state = tr.init_state()
    rng = _jax.random.PRNGKey(5)
    for _ in range(3):
        rng, sub = _jax.random.split(rng)
        state, _ = tr.train_epoch(state, sub)

    path = str(tmp_path / "mid.npz")
    save_checkpoint(path, state, 3, rng, toy_ds.scale)

    # continue directly
    rng_a, sub_a = _jax.random.split(rng)
    state_a, m_a = tr.train_epoch(state, sub_a)

    # restore into a fresh template and continue
    restored, epoch, rng_r, _ = restore_checkpoint(path, tr.init_state(99))
    assert epoch == 3
    rng_b, sub_b = _jax.random.split(rng_r)
    state_b, m_b = tr.train_epoch(restored, sub_b)

    assert m_a["train_ade"] == pytest.approx(m_b["train_ade"], rel=1e-6)
    np.testing.assert_array_equal(
        np.asarray(state_a.g_params["embed"]["w"]),
        np.asarray(state_b.g_params["embed"]["w"]))


def test_crowd_simulate(toy_ds):
    """Multi-window crowd simulation: continuity across windows."""
    from socialways_tpu.engine.simulate import crowd_simulate
    from socialways_tpu.models import init_generator

    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      n_past=4, n_next=3, use_social=True)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n = 32
    obsv0 = jnp.asarray(np.cumsum(rng.randn(n, 4, 2) * 0.01, 1)
                        .astype(np.float32))
    ids = jnp.asarray((np.arange(n) // 8).astype(np.int32))
    out = crowd_simulate(params, obsv0, ids, n_windows=3,
                         rng=jax.random.PRNGKey(1), cfg=cfg)
    assert out.shape == (n, 9, 2)
    assert np.isfinite(np.asarray(out)).all()
    # steps are continuous: consecutive deltas stay bounded (velocities are
    # decoder outputs near init, not jumps)
    deltas = np.abs(np.diff(np.asarray(out), axis=1))
    assert deltas.max() < 5.0


def test_ethucy_merge_scenes(tmp_path):
    from socialways_tpu.engine.ethucy import merge_scenes
    from socialways_tpu.data.toy import make_toy_npz_arrays

    files = []
    for i in range(3):
        d = make_toy_npz_arrays(n_samples=36, n_conditions=6, n_modes=3,
                                n_per_batch=6, seed=i)
        p = tmp_path / f"s{i}.npz"
        np.savez(p, **d)
        files.append(str(p))

    ds = merge_scenes(files[:2], files[2])
    # train part = scenes 0+1, test = scene 2
    assert ds.n_train_samples == 72
    assert ds.n_test_samples == 36
    # batch ranges are contiguous and cover all samples exactly once
    b = np.asarray(ds.batches)
    assert b[0][0] == 0 and b[-1][1] == 108
    assert (b[1:, 0] == b[:-1, 1]).all()
    # normalized into the unit box
    assert ds.obsvs.min() >= -1e-6 and ds.obsvs.max() <= 1 + 1e-6


# --------------------------------------------------- categorical codes
def test_sample_noise_continuous_is_reference_stream():
    from socialways_tpu.engine.losses import sample_noise
    k = jax.random.PRNGKey(3)
    want = jax.random.uniform(k, (5, CFG.noise_len))
    got = sample_noise(k, 5, CFG)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sample_noise_categorical_embeds_onehot():
    from socialways_tpu.engine.losses import sample_noise
    cfg = CFG.replace(latent_code_type="categorical", n_latent_codes=3)
    z = np.asarray(sample_noise(jax.random.PRNGKey(0), 64, cfg))
    head = z[:, :3]
    assert set(np.unique(head)) == {0.0, 1.0}
    np.testing.assert_array_equal(head.sum(1), np.ones(64))
    assert len(np.unique(np.argmax(head, 1))) == 3   # all codes drawn
    assert ((z[:, 3:] >= 0) & (z[:, 3:] < 1)).all()


def test_masked_xent_matches_manual():
    from socialways_tpu.engine.losses import masked_xent
    logits = jnp.asarray([[2.0, 0.0], [0.0, 3.0], [9.0, 9.0]])
    labels = jnp.asarray([0, 1, 0])
    valid = jnp.asarray([True, True, False])
    p = jax.nn.log_softmax(logits)
    want = float(-(p[0, 0] + p[1, 1]) / 2)
    assert float(masked_xent(logits, labels, valid)) == pytest.approx(want)


def test_categorical_gan_step_runs():
    cfg = CFG.replace(latent_code_type="categorical", n_latent_codes=3)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _batch()
    new_state, m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.d_loss)) and np.isfinite(float(m.g_loss))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.g_params, new_state.g_params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_lr_decay_shrinks_updates():
    from socialways_tpu.engine.train_step import make_optimizers
    cfg = CFG.replace(lr_decay_rate=0.5, lr_decay_steps=2)
    g_tx, _ = make_optimizers(cfg)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    opt = g_tx.init(params)
    sizes = []
    for _ in range(4):
        updates, opt = g_tx.update(grads, opt, params)
        sizes.append(float(jnp.abs(updates["w"][0])))
    # steps 0-1 at lr, steps 2-3 at lr/2 (staircase)
    assert sizes[0] == pytest.approx(sizes[1], rel=1e-3)
    assert sizes[2] == pytest.approx(sizes[0] / 2, rel=1e-2)


def test_lr_decay_off_by_default_matches_constant():
    from socialways_tpu.engine.train_step import make_optimizers
    g_tx, _ = make_optimizers(CFG)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    opt = g_tx.init(params)
    u1, opt = g_tx.update(grads, opt, params)
    u2, opt = g_tx.update(grads, opt, params)
    assert float(jnp.abs(u1["w"][0])) == pytest.approx(
        float(jnp.abs(u2["w"][0])), rel=1e-3)


def test_gaussian_noise_option():
    from socialways_tpu.engine.losses import sample_noise
    cfg = CFG.replace(noise_dist="gaussian")
    z = np.asarray(sample_noise(jax.random.PRNGKey(0), 256, cfg))
    assert (z < 0).any()                       # uniform [0,1) never is
    assert abs(z.mean()) < 0.1 and abs(z.std() - 1.0) < 0.1
    # categorical overlay still one-hot under gaussian tail
    cfg2 = cfg.replace(latent_code_type="categorical", n_latent_codes=3)
    z2 = np.asarray(sample_noise(jax.random.PRNGKey(0), 64, cfg2))
    assert set(np.unique(z2[:, :3])) == {0.0, 1.0}


def test_r1_penalty_changes_d_updates_and_stays_finite():
    cfg = CFG.replace(r1_gamma=10.0)
    batch = _batch()
    r = jax.random.PRNGKey(1)
    s0 = init_train_state(jax.random.PRNGKey(0), CFG)
    s_plain, m_plain = gan_step(s0, batch, r, CFG)
    s_r1, m_r1 = gan_step(s0, batch, r, cfg)
    assert np.isfinite(float(m_r1.d_loss))
    assert float(m_r1.d_loss) > float(m_plain.d_loss)   # penalty added
    # D params move differently under the penalty
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s_plain.d_params, s_r1.d_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # G update unaffected by construction? No — G plays against the
    # regularized D, so it may differ; just require finiteness
    assert np.isfinite(float(m_r1.g_loss))


def test_d_only_lr_decay():
    from socialways_tpu.engine.train_step import make_optimizers
    cfg = CFG.replace(d_lr_decay_rate=0.5, d_lr_decay_steps=2)
    g_tx, d_tx = make_optimizers(cfg)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    g_opt, d_opt = g_tx.init(params), d_tx.init(params)
    g_sizes, d_sizes = [], []
    for _ in range(4):
        gu, g_opt = g_tx.update(grads, g_opt, params)
        du, d_opt = d_tx.update(grads, d_opt, params)
        g_sizes.append(float(jnp.abs(gu["w"][0])))
        d_sizes.append(float(jnp.abs(du["w"][0])))
    # G keeps a constant lr; D halves after the first stair
    assert g_sizes[2] == pytest.approx(g_sizes[0], rel=1e-3)
    assert d_sizes[2] == pytest.approx(d_sizes[0] / 2, rel=1e-2)


def test_d_update_every_skips_d_phase():
    cfg = CFG.replace(d_update_every=2)
    batch = _batch()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))

    def d_delta(a, b):
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a.d_params,
            b.d_params)))

    def g_delta(a, b):
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a.g_params,
            b.g_params)))

    s1, _ = step(state, batch, jax.random.PRNGKey(1))   # step 0: D updates
    s2, _ = step(s1, batch, jax.random.PRNGKey(2))      # step 1: D skipped
    s3, _ = step(s2, batch, jax.random.PRNGKey(3))      # step 2: D updates
    assert d_delta(s1, state) > 0
    assert d_delta(s2, s1) == 0                          # untouched
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.all(a == b)), s2.d_opt, s1.d_opt))
    assert d_delta(s3, s2) > 0
    # G still updates every step
    assert g_delta(s1, state) > 0 and g_delta(s2, s1) > 0


def test_d_update_every_one_is_reference_parity():
    batch = _batch()
    r = jax.random.PRNGKey(1)
    s0 = init_train_state(jax.random.PRNGKey(0), CFG)
    a, _ = gan_step(s0, batch, r, CFG)
    b, _ = gan_step(s0, batch, r, CFG.replace(d_update_every=1))
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: bool(jnp.all(x == y)), a, b))


def test_gan_step_windowed_social_matches_dense():
    """max_scene_size routes training social attention through the windowed
    O(N*max_scene) form; forced here by shrinking the dense cutoff.  n is
    large enough that win = block + 2*max_scene < n_tot, so the REAL
    windowed slicing (and its rematerialized vjp) runs — at small n the
    windowed form silently falls back to blockwise and the test would
    prove nothing."""
    import sys
    import socialways_tpu.kernels.social_attention  # noqa: F401
    sa = sys.modules["socialways_tpu.kernels.social_attention"]
    from socialways_tpu.ops.social import social_context_windowed  # noqa

    cfg_dense = CFG.replace(use_social=True)
    cfg_win = CFG.replace(use_social=True, max_scene_size=8)
    n = 640                            # n_tot=1024 > win=512+16=528
    rng = np.random.RandomState(5)
    batch = {
        "obsvs": jnp.asarray(rng.rand(n, CFG.n_past, 2).astype(np.float32)),
        "preds": jnp.asarray(rng.rand(n, CFG.n_next, 2).astype(np.float32)),
        "scene_ids": jnp.asarray(np.sort(np.arange(n) % (n // 8))
                                 .astype(np.int32)),
        "valid": jnp.ones((n,), bool),
    }
    r = jax.random.PRNGKey(1)
    s0 = init_train_state(jax.random.PRNGKey(0), cfg_dense)
    a, ma = gan_step(s0, batch, r, cfg_dense)
    orig = sa._DENSE_MAX_AGENTS
    sa._DENSE_MAX_AGENTS = 2          # force the windowed branch
    try:
        b, mb = gan_step(s0, batch, r, cfg_win)
    finally:
        sa._DENSE_MAX_AGENTS = orig
    assert float(ma.g_loss) == pytest.approx(float(mb.g_loss), rel=2e-4)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x),
                                                np.asarray(y), rtol=2e-3,
                                                atol=2e-6),
        a.g_params, b.g_params)


def test_remat_steps_is_value_identical():
    """remat_steps only changes memory scheduling — the train step result
    must match the unrolled form exactly (same ops, same order)."""
    batch = _batch()
    r = jax.random.PRNGKey(1)
    s0 = init_train_state(jax.random.PRNGKey(0), CFG)
    a, ma = gan_step(s0, batch, r, CFG.replace(use_social=True))
    b, mb = gan_step(s0, batch, r,
                     CFG.replace(use_social=True, remat_steps=True))
    assert float(ma.g_loss) == pytest.approx(float(mb.g_loss), rel=1e-6)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7),
        a.g_params, b.g_params)


def test_g_ema_tracks_and_checkpoints(tmp_path):
    """EMA shadow: updated as d*ema + (1-d)*params after each G step,
    used by eval_params, round-trips through checkpoints."""
    import jax
    from socialways_tpu.engine.train_step import (eval_params, gan_step,
                                                  init_train_state)
    from socialways_tpu.io.checkpoint import (restore_checkpoint,
                                              save_checkpoint)

    cfg = CFG.replace(n_unrolling_steps=0, g_ema_decay=0.9)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    assert state.g_ema is not None
    batch = _batch()
    s1, _ = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, jax.random.PRNGKey(1))

    expect = jax.tree_util.tree_map(
        lambda e, p: 0.9 * e + 0.1 * p, state.g_params, s1.g_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        s1.g_ema, expect)
    # eval reads the EMA shadow
    assert eval_params(s1) is s1.g_ema

    path = str(tmp_path / "ema.npz")
    save_checkpoint(path, s1, 1, jax.random.PRNGKey(2))
    template = init_train_state(jax.random.PRNGKey(3), cfg)
    s2, _, _, _ = restore_checkpoint(path, template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s1.g_ema, s2.g_ema)

    # without EMA the field is structurally absent (old checkpoint layout)
    cfg0 = cfg.replace(g_ema_decay=0.0)
    s0 = init_train_state(jax.random.PRNGKey(0), cfg0)
    assert s0.g_ema is None and eval_params(s0) is s0.g_params


def test_lr_warmup_scales_first_updates():
    import jax
    import jax.numpy as jnp
    from socialways_tpu.engine.train_step import make_optimizers

    cfg = TrainConfig(lr_warmup_steps=10)
    cfg0 = TrainConfig()
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.5)}

    for c, scale in ((cfg, 0.1), (cfg0, 1.0)):
        g_tx, _ = make_optimizers(c)
        st = g_tx.init(params)
        upd, _ = g_tx.update(grads, st, params)
        # Adam step magnitude == lr at step 0; warmup scales it by 1/10
        np.testing.assert_allclose(float(jnp.abs(upd["w"]).max()),
                                   c.lr_g * scale, rtol=1e-4)


def test_d_update_ratio_warmup_schedule():
    """--d-update-every 1 + end 2 (switch at 2): D updates on steps
    0,1 (ratio 1) then every other step (2 yes, 3 no)."""
    import jax
    from socialways_tpu.engine.train_step import gan_step, init_train_state

    cfg = CFG.replace(n_unrolling_steps=0, d_update_every=1,
                      d_update_every_end=2, d_update_every_switch=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _batch()
    step = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))

    changed = []
    for i in range(4):
        new_state, _ = step(state, batch, jax.random.PRNGKey(10 + i))
        d_delta = jax.tree_util.tree_reduce(
            lambda acc, x: acc + float(np.abs(np.asarray(x)).sum()),
            jax.tree_util.tree_map(lambda a, b: a - b,
                                   new_state.d_params, state.d_params),
            0.0)
        changed.append(d_delta > 0)
        state = new_state
    assert changed == [True, True, True, False]


def test_serial_rollout_matches_shared_vjp():
    """--serial-rollout recomputes the rollout instead of sharing one vjp;
    the step must be value-identical (same noise, same pre-update G)."""
    import jax
    from socialways_tpu.engine.train_step import gan_step, init_train_state

    cfg = CFG.replace(n_unrolling_steps=1)
    cfg_s = cfg.replace(serial_rollout=True)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _batch(key=3)
    rng = jax.random.PRNGKey(5)

    s_a, m_a = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)
    s_b, m_b = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_s))(
        state, batch, rng)

    np.testing.assert_allclose(float(m_a.g_loss), float(m_b.g_loss),
                               rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s_a.g_params, s_b.g_params)


@pytest.mark.parametrize("use_social,n_valid", [(True, 8), (False, 6)])
def test_grad_accum_matches_full_batch(use_social, n_valid):
    """grad_accum chunks the D/G gradients over micro-batches with
    valid-share weighting — the update must equal the full-batch step up
    to float reassociation (masked means are linear in per-chunk sums).
    Scene layout: _batch sorts scene ids descending, so with n_scenes=2
    and chunks of 4 the social case is scene-aligned; the padded case
    runs social-off (no cross-sample interaction, alignment not
    required)."""
    cfg = CFG.replace(n_unrolling_steps=2, use_social=use_social,
                      use_l2_loss=True)
    cfg_a = cfg.replace(grad_accum=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _batch(n=8, n_scenes=2, n_valid=n_valid, key=11)
    rng = jax.random.PRNGKey(6)

    s_full, m_full = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)
    s_acc, m_acc = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_a))(
        state, batch, rng)

    np.testing.assert_allclose(float(m_acc.g_loss), float(m_full.g_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_acc.d_loss), float(m_full.d_loss),
                               rtol=1e-5)
    assert int(m_acc.n_samples) == int(m_full.n_samples) == n_valid
    for tree_a, tree_b in ((s_acc.g_params, s_full.g_params),
                           (s_acc.d_params, s_full.d_params)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            tree_a, tree_b)


def test_grad_accum_alignment_check():
    """Trainer validates (host-side, at pack time) that social micro-chunks
    never split a scene; padding (-1) at a boundary is fine."""
    from socialways_tpu.data.dataset import PackedBatches
    from socialways_tpu.engine.trainer import _check_grad_accum_alignment

    def packed(ids):
        ids = np.asarray([ids], np.int32)
        n = ids.shape[1]
        return PackedBatches(
            obsvs=np.zeros((1, n, 2, 2), np.float32),
            preds=np.zeros((1, n, 2, 2), np.float32),
            scene_ids=ids, valid=ids != -1,
            n_valid=np.asarray([(ids != -1).sum()], np.int32))

    # aligned: scene 0 rows 0-3, scene 1 rows 4-7
    _check_grad_accum_alignment(packed([0, 0, 0, 0, 1, 1, 1, 1]), 2, True)
    # padding at the boundary is allowed
    _check_grad_accum_alignment(packed([0, 0, 0, -1, -1, -1, -1, -1]),
                                2, True)
    # scene 1 crosses rows 3|4 -> rejected for social, fine without
    bad = packed([0, 0, 0, 1, 1, 1, -1, -1])
    with pytest.raises(ValueError, match="splits scene"):
        _check_grad_accum_alignment(bad, 2, True)
    _check_grad_accum_alignment(bad, 2, False)
    # width not divisible
    with pytest.raises(ValueError, match="divisible"):
        _check_grad_accum_alignment(packed([0, 0, 0, 0, 1, 1]), 4, False)


def test_grad_accum_rejects_bad_shapes():
    cfg = CFG.replace(grad_accum=3)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="divisible"):
        gan_step(state, _batch(n=8), jax.random.PRNGKey(1), cfg)
    cfg_v = CFG.replace(grad_accum=2, use_variety_loss=True)
    state_v = init_train_state(jax.random.PRNGKey(0), cfg_v)
    with pytest.raises(ValueError, match="variety"):
        gan_step(state_v, _batch(n=8), jax.random.PRNGKey(1), cfg_v)


# -------------------------------------------------- PacGAN + instance noise
def test_pac_classifier_scores_packs():
    """pac=2: classifier input is h*pac wide, one label per pack, Q-head
    per-sample; the GAN step runs and updates both players."""
    from socialways_tpu.models.discriminator import discriminator_apply
    from socialways_tpu.ops.traj import get_traj_4d

    cfg = CFG.replace(pac=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    assert (state.d_params["classifier"][0]["w"].shape[0]
            == cfg.hidden_size * 2)
    batch = _batch(n=8, n_valid=5)  # pack (4,5) mixes valid+pad -> dropped
    o4, p4 = get_traj_4d(batch["obsvs"], batch["preds"])
    label, code = discriminator_apply(state.d_params, o4, p4, pac=2)
    assert label.shape == (4, 1)
    assert code.shape == (8, cfg.n_latent_codes)
    new_state, m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.d_loss)) and np.isfinite(float(m.g_loss))
    d_delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.d_params,
                               state.d_params), 0.0)
    assert d_delta > 0


def test_pac_group_valid_drops_mixed_packs():
    """A pack with any padded sample contributes nothing to the label loss:
    corrupting a padded row's prediction must not change the losses."""
    cfg = CFG.replace(pac=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _batch(n=8, n_valid=5)
    step = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))
    _, m1 = step(state, batch, jax.random.PRNGKey(1))
    poisoned = dict(batch)
    poisoned["preds"] = batch["preds"].at[6].set(1e4)  # padded row
    _, m2 = step(state, poisoned, jax.random.PRNGKey(1))
    assert float(m1.d_loss) == pytest.approx(float(m2.d_loss), rel=1e-6)
    assert float(m1.g_loss) == pytest.approx(float(m2.g_loss), rel=1e-6)


def test_pac_rejects_indivisible_batch():
    cfg = CFG.replace(pac=3)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="pac"):
        gan_step(state, _batch(n=8), jax.random.PRNGKey(1), cfg)


@pytest.mark.parametrize("n_valid", [8, 5])
def test_pac_grad_accum_composes(n_valid):
    """pac>1 under grad_accum must equal the full-batch step exactly.
    n_valid=5 makes pack (4,5) MIXED (one valid, one padding sample): the
    label term is a mean over valid PACKS while info is over valid SAMPLES,
    so accumulation weights the two terms by different per-chunk shares —
    a single sample-share weight would skew the D gradient here."""
    cfg = CFG.replace(pac=2, n_unrolling_steps=1)
    cfg_a = cfg.replace(grad_accum=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _batch(n=8, n_scenes=2, n_valid=n_valid, key=11)
    rng = jax.random.PRNGKey(6)
    s_full, m_full = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)
    s_acc, m_acc = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_a))(
        state, batch, rng)
    np.testing.assert_allclose(float(m_acc.g_loss), float(m_full.g_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_acc.d_loss), float(m_full.d_loss),
                               rtol=1e-5)
    for tree_a, tree_b in ((s_acc.g_params, s_full.g_params),
                           (s_acc.d_params, s_full.d_params)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            tree_a, tree_b)


def test_d_input_noise_perturbs_then_anneals_to_parity():
    """Instance noise changes the D loss while active; after the anneal
    window (sigma=0) the step equals the no-noise step exactly."""
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    key = jax.random.PRNGKey(1)
    base = jax.jit(lambda s, b, r: gan_step(s, b, r, CFG))
    cfg_n = CFG.replace(d_input_noise=0.5)
    noisy = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_n))
    _, m_base = base(state, batch, key)
    _, m_noisy = noisy(state, batch, key)
    assert float(m_base.d_loss) != float(m_noisy.d_loss)
    assert np.isfinite(float(m_noisy.d_loss))
    assert np.isfinite(float(m_noisy.g_loss))

    # advance one step so the G Adam count is 1 >= anneal window of 1
    s1, _ = base(state, batch, key)
    cfg_ann = CFG.replace(d_input_noise=0.5, d_input_noise_steps=1)
    key2 = jax.random.PRNGKey(2)
    _, m_ann = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_ann))(
        s1, batch, key2)
    _, m_ref = base(s1, batch, key2)
    assert float(m_ann.d_loss) == pytest.approx(float(m_ref.d_loss),
                                                rel=1e-6)
    assert float(m_ann.g_loss) == pytest.approx(float(m_ref.g_loss),
                                                rel=1e-6)


def test_d_input_noise_floor_keeps_late_noise():
    """--d-input-noise-floor: past the anneal window sigma clamps at the
    floor, so the step equals the CONSTANT-sigma=floor step exactly (same
    eps stream, only the std differs) and differs from the clean step."""
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    base = jax.jit(lambda s, b, r: gan_step(s, b, r, CFG))
    s1, _ = base(state, batch, jax.random.PRNGKey(1))  # G count 1 >= window
    cfg_floor = CFG.replace(d_input_noise=0.5, d_input_noise_steps=1,
                            d_input_noise_floor=0.1)
    cfg_const = CFG.replace(d_input_noise=0.1)
    key2 = jax.random.PRNGKey(2)
    _, m_floor = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_floor))(
        s1, batch, key2)
    _, m_const = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_const))(
        s1, batch, key2)
    _, m_clean = base(s1, batch, key2)
    assert float(m_floor.d_loss) == pytest.approx(float(m_const.d_loss),
                                                  rel=1e-6)
    assert float(m_floor.d_loss) != float(m_clean.d_loss)


def test_trainer_resolves_anneal_sentinel(toy_ds):
    """d_input_noise_steps=-1 (anneal over the whole run) is resolved by
    Trainer itself — mesh-aware optimizer-step count — so EVERY driver
    that builds a Trainer directly (benchmarks, EnsembleTrainer, eth-ucy)
    gets the annealed schedule, not a constant-noise run (round-4 review
    finding: only cli train used to resolve it)."""
    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      batch_size=64, n_epochs=3, seed=0,
                      d_input_noise=0.05, d_input_noise_steps=-1)
    tr = Trainer(cfg, toy_ds)
    assert tr.cfg.d_input_noise_steps == 3 * tr.n_steps_per_epoch
    assert tr.cfg.d_input_noise_steps > 0


def test_d_input_noise_with_grad_accum():
    cfg = CFG.replace(d_input_noise=0.3, grad_accum=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    _, m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, _batch(n=8), jax.random.PRNGKey(1))
    assert np.isfinite(float(m.d_loss)) and np.isfinite(float(m.g_loss))


# ------------------------------------------------------- spectral norm
def test_spectral_normalize_unit_top_singular_value():
    from socialways_tpu.ops.nn import spectral_normalize
    rng = np.random.RandomState(3)
    for shape in [(32, 16), (16, 1), (64, 32)]:
        w = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2.0)
        w_sn = spectral_normalize(w)
        top = np.linalg.svd(np.asarray(w_sn), compute_uv=False)[0]
        assert top == pytest.approx(1.0, abs=1e-3)
        # direction preserved, only a scalar rescale
        ratio = np.asarray(w) / np.asarray(w_sn)
        assert np.allclose(ratio, ratio.flat[0], rtol=1e-5)


def test_spectral_normalize_d_scope():
    """Only the FC branches + classifier are normalized; the Q-head and
    the obsv LSTM keep their raw weights (see the docstring's rationale)."""
    from socialways_tpu.models.discriminator import (init_discriminator,
                                                     spectral_normalize_d)
    params = init_discriminator(jax.random.PRNGKey(0), CFG)
    sn = spectral_normalize_d(params)
    for k in ("obsv_fc", "pred_fc", "classifier"):
        for raw, done in zip(params[k], sn[k]):
            top = np.linalg.svd(np.asarray(done["w"]),
                                compute_uv=False)[0]
            # uniform-init weights can have spectral gap ~0.97, where 30
            # power iterations land within ~0.2% — plenty for SN-GAN
            assert top == pytest.approx(1.0, abs=5e-3)
            np.testing.assert_array_equal(np.asarray(raw["b"]),
                                          np.asarray(done["b"]))
    np.testing.assert_array_equal(
        np.asarray(params["latent_dec"][0]["w"]),
        np.asarray(sn["latent_dec"][0]["w"]))
    np.testing.assert_array_equal(np.asarray(params["obsv_lstm"]["w"]),
                                  np.asarray(sn["obsv_lstm"]["w"]))


def test_spectral_norm_gan_step_runs_and_differs():
    cfg = CFG.replace(spectral_norm=True)
    batch = _batch()
    key = jax.random.PRNGKey(1)
    s0 = init_train_state(jax.random.PRNGKey(0), CFG)
    s_plain, m_plain = jax.jit(
        lambda s, b, r: gan_step(s, b, r, CFG))(s0, batch, key)
    s_sn, m_sn = jax.jit(
        lambda s, b, r: gan_step(s, b, r, cfg))(s0, batch, key)
    assert np.isfinite(float(m_sn.d_loss))
    assert np.isfinite(float(m_sn.g_loss))
    assert float(m_sn.d_loss) != float(m_plain.d_loss)
    # both players still update under the normalized D
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s0.g_params, s_sn.g_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_transplant_schedule_clock():
    """Rescue restores params/moments from the checkpoint but keeps every
    optimizer `count` (and with it the sigma-anneal/lr-decay clocks) on the
    monotonic wall clock."""
    from socialways_tpu.engine import transplant_schedule_clock
    from socialways_tpu.engine.train_step import _g_step_count
    cfg = CFG.replace(d_input_noise=0.1, d_input_noise_steps=10)
    step = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))
    s = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _batch()
    early, _ = step(s, batch, jax.random.PRNGKey(1))
    late = early
    for i in range(2, 5):
        late, _ = step(late, batch, jax.random.PRNGKey(i))
    merged = transplant_schedule_clock(early, late)
    # clock comes from `late`, Adam moments from `early`
    assert int(_g_step_count(merged.g_opt)) == int(_g_step_count(late.g_opt))
    mu_e = jax.tree_util.tree_leaves(early.g_opt)
    mu_m = jax.tree_util.tree_leaves(merged.g_opt)
    mu_l = jax.tree_util.tree_leaves(late.g_opt)
    moved = [float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(mu_m, mu_e) if a.ndim > 0]
    assert max(moved) == 0.0                     # moments untouched
    assert any(float(jnp.max(jnp.abs(a - b))) > 0
               for a, b in zip(mu_e, mu_l) if a.ndim > 0)  # sanity: differ
    # d_opt clock transplanted too
    d_counts = [x for x in jax.tree_util.tree_leaves(merged.d_opt)
                if x.ndim == 0 and jnp.issubdtype(x.dtype, jnp.integer)]
    d_late = [x for x in jax.tree_util.tree_leaves(late.d_opt)
              if x.ndim == 0 and jnp.issubdtype(x.dtype, jnp.integer)]
    assert [int(x) for x in d_counts] == [int(x) for x in d_late]


# ------------------------------------------------------------- ensemble
def test_ensemble_members_match_solo_runs(toy_ds):
    """vmapped N-seed ensemble == N solo fused-epoch runs: same per-member
    metrics and eval, up to float reassociation (batched vs single matmuls)."""
    from socialways_tpu.engine import EnsembleTrainer, member_state
    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      batch_size=64, n_unrolling_steps=1, seed=0)
    tr = Trainer(cfg, toy_ds)
    ens = EnsembleTrainer(tr)
    seeds = [0, 1]
    states = ens.init_states(seeds)
    rngs = jnp.stack([jax.random.PRNGKey(100 + s) for s in seeds])
    states, m = ens.train_epochs(states, rngs, n=3)
    ev = ens.evaluate(states, rngs, n_gen_samples=4)

    for i, seed in enumerate(seeds):
        solo = tr.init_state(seed)
        solo, ms = tr.train_epochs(solo, jax.random.PRNGKey(100 + seed), n=3)
        assert float(m["train_ade"][i]) == pytest.approx(
            ms["train_ade"], rel=2e-4)
        assert float(m["g_loss"][i]) == pytest.approx(
            ms["g_loss"], rel=2e-4)
        ev_solo = tr.evaluate(solo, jax.random.PRNGKey(100 + seed),
                              n_gen_samples=4)
        assert ev[i]["ade_min"] == pytest.approx(ev_solo["ade_min"],
                                                 rel=2e-4)
        # extracting the member reproduces the solo params
        w_m = np.asarray(member_state(states, i).g_params["embed"]["w"])
        w_s = np.asarray(solo.g_params["embed"]["w"])
        np.testing.assert_allclose(w_m, w_s, rtol=2e-4, atol=1e-6)
    # members are genuinely different models
    assert float(m["g_loss"][0]) != float(m["g_loss"][1])


def test_ensemble_coverage_per_member(toy_ds):
    from socialways_tpu.engine import EnsembleTrainer
    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      batch_size=64, n_unrolling_steps=0, seed=0,
                      n_gen_samples=4)
    ens = EnsembleTrainer(Trainer(cfg, toy_ds))
    seeds = [0, 1]
    states = ens.init_states(seeds)
    rngs = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    covs = ens.coverage(states, rngs, n_samples=16)
    assert len(covs) == 2
    for c in covs:
        assert 0.0 <= c <= 1.0


def test_ensemble_mesh_matches_single_chip(toy_ds):
    """EnsembleTrainer(mesh=...) shards the member axis over the 8-device
    mesh (shard_map around the vmap; data replicated, zero collectives) —
    per-member training, eval and coverage must match the single-chip
    vmapped ensemble up to float reassociation."""
    from socialways_tpu.engine import EnsembleTrainer, Trainer
    from socialways_tpu.parallel import make_mesh
    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      batch_size=64, n_unrolling_steps=1, seed=0,
                      n_gen_samples=4)
    ens_flat = EnsembleTrainer(Trainer(cfg, toy_ds))
    ens_mesh = EnsembleTrainer(Trainer(cfg, toy_ds), mesh=make_mesh(8))
    seeds = list(range(8))
    rngs = jnp.stack([jax.random.PRNGKey(100 + s) for s in seeds])

    s_f = ens_flat.init_states(seeds)
    s_m = ens_mesh.init_states(seeds)
    s_f, m_f = ens_flat.train_epochs(s_f, rngs, n=2)
    s_m, m_m = ens_mesh.train_epochs(s_m, rngs, n=2)
    np.testing.assert_allclose(np.asarray(m_m["g_loss"]),
                               np.asarray(m_f["g_loss"]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s_m.g_params["embed"]["w"]),
                               np.asarray(s_f.g_params["embed"]["w"]),
                               rtol=2e-4, atol=1e-6)

    ev_f = ens_flat.evaluate(s_f, rngs, n_gen_samples=4)
    ev_m = ens_mesh.evaluate(s_m, rngs, n_gen_samples=4)
    for a, b in zip(ev_m, ev_f):
        assert a["ade_min"] == pytest.approx(b["ade_min"], rel=2e-4)

    cov_f = ens_flat.coverage(s_f, rngs, n_samples=16)
    cov_m = ens_mesh.coverage(s_m, rngs, n_samples=16)
    assert cov_m == pytest.approx(cov_f, abs=1e-6)


def test_ensemble_mesh_rejects_indivisible_members(toy_ds):
    from socialways_tpu.engine import EnsembleTrainer, Trainer
    from socialways_tpu.parallel import make_mesh
    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      batch_size=64)
    ens = EnsembleTrainer(Trainer(cfg, toy_ds), mesh=make_mesh(8))
    with pytest.raises(ValueError, match="not divisible"):
        ens.init_states([0, 1, 2])


# ------------------------------------------------------- minibatch stddev
def test_mb_std_feature_masked_and_detects_collapse():
    from socialways_tpu.models.discriminator import mb_std_feature

    rng = np.random.RandomState(0)
    diverse = jnp.asarray(rng.randn(16, 4, 4).astype(np.float32))
    collapsed = jnp.broadcast_to(diverse[:1], diverse.shape)
    v = jnp.ones(16, bool)
    f_div = float(mb_std_feature(diverse, v)[0, 0])
    f_col = float(mb_std_feature(collapsed, v)[0, 0])
    assert f_col < 1e-3 < f_div

    # padding rows excluded: huge outliers on invalid rows change nothing
    poisoned = np.asarray(diverse).copy()
    poisoned[10:] = 1e6
    v2 = jnp.asarray(np.arange(16) < 10)
    f_masked = float(mb_std_feature(jnp.asarray(poisoned), v2)[0, 0])
    f_clean = float(mb_std_feature(diverse[:10], jnp.ones(10, bool))[0, 0])
    np.testing.assert_allclose(f_masked, f_clean, rtol=1e-5)
    # broadcast shape
    assert mb_std_feature(diverse, v).shape == (16, 1)


def test_gan_step_mb_std_trains_and_shapes():
    """--mb-std: classifier input grows by 1 scalar per packed sample; the
    step runs with finite losses and moves both players (incl. composed
    with pac=2 and unrolling)."""
    for pac in (1, 2):
        cfg = CFG.replace(mb_std=True, pac=pac, n_unrolling_steps=1)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        w0 = state.d_params["classifier"][0]["w"]
        assert w0.shape[0] == (cfg.hidden_size + 1) * pac
        batch = _batch()
        new_state, m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
            state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m.d_loss)) and np.isfinite(float(m.g_loss))
        d_delta = jax.tree_util.tree_reduce(
            lambda acc, x: acc + float(jnp.abs(x).sum()),
            jax.tree_util.tree_map(lambda a, b: a - b, new_state.d_params,
                                   state.d_params), 0.0)
        assert d_delta > 0


def test_gan_step_mode_seeking_trains_and_pressures_diversity():
    """--ms-weight: the G loss gains the strictly positive w/(r+eps) term
    (same rng stream — the fresh draw derives via fold_in so the base
    losses are untouched), the D phase is unaffected by a G-only
    regularizer, and the G update actually changes."""
    cfg0 = CFG.replace(n_unrolling_steps=1)
    cfg1 = cfg0.replace(ms_weight=0.1)
    state = init_train_state(jax.random.PRNGKey(0), cfg0)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    s0, m0 = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg0))(
        state, batch, rng)
    s1, m1 = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg1))(
        state, batch, rng)
    assert np.isfinite(float(m1.g_loss)) and np.isfinite(float(m1.d_loss))
    assert float(m1.g_loss) > float(m0.g_loss)
    np.testing.assert_allclose(float(m1.d_loss), float(m0.d_loss),
                               rtol=1e-5)
    g_diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, s1.g_params,
                               s0.g_params), 0.0)
    assert g_diff > 0


def test_mode_seeking_rejects_grad_accum():
    for kw in ({"ms_weight": 0.1}, {"ds_weight": 0.1}):
        cfg = CFG.replace(grad_accum=2, **kw)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="mode-seeking"):
            gan_step(state, _batch(), jax.random.PRNGKey(1), cfg)


def test_diversity_hinge_tau_gates_the_term():
    """--ds-weight: with tau=0 the hinge max(0, -d/dz) is identically zero,
    so the step reproduces the baseline g_loss (up to the reassociation of
    the changed autodiff path); with a tau above any achievable diversity
    ratio the term is active — g_loss grows, G moves differently, and the
    D phase (a G-only regularizer) is untouched."""
    cfg0 = CFG.replace(n_unrolling_steps=1)
    state = init_train_state(jax.random.PRNGKey(0), cfg0)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    s0, m0 = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg0))(
        state, batch, rng)

    cfg_silent = cfg0.replace(ds_weight=0.5, ds_tau=0.0)
    _, m_silent = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_silent))(
        state, batch, rng)
    np.testing.assert_allclose(float(m_silent.g_loss), float(m0.g_loss),
                               rtol=1e-5)

    cfg_hot = cfg0.replace(ds_weight=0.5, ds_tau=100.0)
    s_hot, m_hot = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_hot))(
        state, batch, rng)
    assert np.isfinite(float(m_hot.g_loss))
    assert float(m_hot.g_loss) > float(m0.g_loss)
    np.testing.assert_allclose(float(m_hot.d_loss), float(m0.d_loss),
                               rtol=1e-5)
    g_diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, s_hot.g_params,
                               s0.g_params), 0.0)
    assert g_diff > 0

    # K-sample pooling (--ds-k 4): 3 extra rollouts, still finite, D
    # untouched, and a different G step than the K=2 form
    cfg_k4 = cfg_hot.replace(ds_k=4)
    s_k4, m_k4 = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg_k4))(
        state, batch, rng)
    assert np.isfinite(float(m_k4.g_loss))
    np.testing.assert_allclose(float(m_k4.d_loss), float(m0.d_loss),
                               rtol=1e-5)
    k_diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, s_k4.g_params,
                               s_hot.g_params), 0.0)
    assert k_diff > 0


def test_info_weight_schedule():
    """Info-weight ramp (cfg.loss_info_w_end): a flat ramp (end == start)
    reproduces the unscheduled step exactly; a rising ramp changes the G
    loss at step 0 only through the (tiny) start-fraction difference —
    and after advancing the optimizer clock the scheduled step's info
    term visibly grows."""
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _batch(key=3)
    rng = jax.random.PRNGKey(5)

    base = CFG.replace(loss_info_w=1.0)
    flat = CFG.replace(loss_info_w=1.0, loss_info_w_end=1.0,
                       loss_info_w_steps=100)
    _, m_base = gan_step(state, batch, rng, base)
    _, m_flat = gan_step(state, batch, rng, flat)
    np.testing.assert_allclose(float(m_base.g_loss), float(m_flat.g_loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_base.d_loss), float(m_flat.d_loss),
                               rtol=1e-6)

    # advance 3 steps under the ramp, then compare a scheduled vs
    # constant-weight step from the SAME state: the ramp is at
    # 1 + (5-1)*3/4 = 4.0, so the info parts of the losses must differ
    ramp = CFG.replace(loss_info_w=1.0, loss_info_w_end=5.0,
                       loss_info_w_steps=4)
    st = state
    for i in range(3):
        st, _ = gan_step(st, batch, jax.random.fold_in(rng, i), ramp)
    _, m_ramp = gan_step(st, batch, rng, ramp)
    _, m_const = gan_step(st, batch, rng, base)
    assert abs(float(m_ramp.g_loss) - float(m_const.g_loss)) > 1e-4
    assert np.isfinite(float(m_ramp.g_loss))


def test_stall_tracker_semantics():
    """StallTracker (engine/rescue.py): patience counting with the 2%
    improvement bar, post-rescue grace absorption, and the consecutive-
    ineffective cap with its documented first-rescue-never-counted
    semantics (up to max_rescues + 1 rescues per stall episode)."""
    from socialways_tpu.engine.rescue import StallTracker

    # patience=0 => disabled entirely
    t = StallTracker(0)
    assert not any(t.observe(1.0) for _ in range(5))

    # a >2% improvement resets the stall counter; <2% does not
    t = StallTracker(2)
    assert not t.observe(1.00)          # sets the bar
    assert not t.observe(0.97)          # 3% better -> bar moves, stall 0
    assert not t.observe(0.96)          # ~1% -> stall 1
    assert t.observe(0.955)             # still <2% -> stall 2 -> fire
    t.fired(0.955, at_epoch=4)
    assert t.rescues == [4] and t.bar == 0.955

    # grace: the next `grace` observes are absorbed (no counting at all)
    t = StallTracker(1, grace=2)
    assert t.observe(1.0) is False and t.observe(1.0) is True
    t.fired(1.0, at_epoch=2)
    assert not t.observe(5.0)           # grace 1 (transient ignored)
    assert not t.observe(5.0)           # grace 2
    assert t.observe(1.0)               # counting resumes; patience 1
                                        # reached (bar 1.0, no improve)

    # cap: first rescue never judged; with max_rescues=1 exactly two
    # rescues fire when no new best appears, then the cap blocks.
    # (patience=1: the first eval that sets the bar doesn't count a
    # stall, the next non-improving eval fires)
    t = StallTracker(1, max_rescues=1)
    assert t.observe(1.0) is False and t.observe(1.0) is True
    assert t.fired(1.0, at_epoch=2) == 0     # first rescue: streak 0
    # after fired() the bar is the best ADE, so a non-improving eval
    # immediately exhausts patience 1 again
    assert t.observe(1.0) is True
    assert t.fired(1.0, at_epoch=3) == 1     # ineffective: streak 1
    assert not any(t.observe(1.0) for _ in range(4))   # capped

    # ...but a new global best (>2% under the best at last rescue)
    # resets the streak and re-arms rescuing
    t = StallTracker(1, max_rescues=1)
    t.observe(1.0)
    assert t.observe(1.0) is True
    t.fired(1.0, at_epoch=2)
    assert t.observe(0.9) is False           # >2% better: bar moves
    assert t.observe(0.9) is True            # then stalls again
    assert t.fired(0.9, at_epoch=4) == 0     # 0.9 < 0.98 * 1.0 -> reset


def test_stall_tracker_classifier_early_trigger():
    """The signature-matched early trigger (r4m diagnosis wired into the
    rescue): flat evals matching the broad-under-fit signature (avg-of-K
    >= ratio x min-of-K, train ADE tracking the avg) fire after
    classify_patience instead of the full patience; healthy-looking or
    overfit-shaped evals never take the early path."""
    from socialways_tpu.engine.rescue import StallTracker

    # stalled signature: fires after 2 signature evals, not patience 5
    t = StallTracker(5, classify_patience=2)
    assert not t.observe(0.20, ade_avg=0.70, train_ade=0.63)  # sets bar
    assert not t.observe(0.20, ade_avg=0.70, train_ade=0.63)  # hit 1
    assert t.observe(0.20, ade_avg=0.70, train_ade=0.63)      # hit 2 -> fire
    assert t.last_trigger == "classifier"
    assert t.fired_early == 0          # counted only when EXECUTED
    t.fired(0.20, at_epoch=3)
    assert t.fired_early == 1
    assert t.signature_hits == 0

    # healthy diversity ratio (avg/min ~1.8): no early fire; the
    # patience path still fires at 5
    t = StallTracker(5, classify_patience=2)
    fires = [t.observe(0.10, ade_avg=0.18, train_ade=0.20)
             for _ in range(6)]
    assert fires == [False] * 5 + [True]          # bar eval + patience 5
    assert t.last_trigger == "patience"
    t.fired(0.10, at_epoch=6)
    assert t.fired_early == 0          # patience fire, not classifier

    # overfit shape (train << avg) does not match the under-fit signature
    t = StallTracker(5, classify_patience=2)
    for _ in range(4):
        assert not t.observe(0.20, ade_avg=0.70, train_ade=0.10)
    assert t.fired_early == 0

    # an improving eval resets the signature streak
    t = StallTracker(5, classify_patience=2)
    t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    t.observe(0.20, ade_avg=0.70, train_ade=0.63)             # hit 1
    assert not t.observe(0.15, ade_avg=0.50, train_ade=0.45)  # improve
    assert t.signature_hits == 0

    # classify_patience=0 (shipped default): signature ignored, missing
    # kwargs accepted (patience-only callers unchanged)
    t = StallTracker(2, classify_patience=0)
    assert not t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    assert not t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    assert t.observe(0.20)                        # plain patience path
    assert t.fired_early == 0

    # missing train_ade: signature decided on the avg/min ratio alone
    t = StallTracker(5, classify_patience=2)
    t.observe(0.20, ade_avg=0.70)
    t.observe(0.20, ade_avg=0.70)
    assert t.observe(0.20, ade_avg=0.70)
    t.fired(0.20, at_epoch=3)
    assert t.fired_early == 1


def test_jitter_generator_perturbs_only_raw_g():
    """jitter_generator (the second rescue lever): relative per-leaf
    perturbation of the RAW G params only — EMA, D, and both optimizer
    states are untouched; sigma=0 is the identity."""
    import jax
    import numpy as np
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.engine.rescue import jitter_generator
    from socialways_tpu.engine.train_step import init_train_state

    cfg = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                      n_past=2, n_next=2, g_ema_decay=0.99)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    assert jitter_generator(state, jax.random.PRNGKey(1), 0.0) is state

    out = jitter_generator(state, jax.random.PRNGKey(1), 0.01)
    # every G leaf moved by ~1% of its RMS, none exactly equal
    for a, b in zip(jax.tree_util.tree_leaves(state.g_params),
                    jax.tree_util.tree_leaves(out.g_params)):
        a, b = np.asarray(a), np.asarray(b)
        assert not np.array_equal(a, b)
        rms = np.sqrt(np.mean(a ** 2) + 1e-12)
        rel = np.sqrt(np.mean((b - a) ** 2)) / rms
        assert 0.002 < rel < 0.05          # ~sigma, loose sampling bound
    # EMA and D untouched (served quality preserved)
    for a, b in zip(jax.tree_util.tree_leaves(state.g_ema),
                    jax.tree_util.tree_leaves(out.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.d_params),
                    jax.tree_util.tree_leaves(out.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.g_opt),
                    jax.tree_util.tree_leaves(out.g_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stall_tracker_gated_mode():
    """patience < 0 = classify-ONLY (gated) mode: the blunt patience
    path never fires; only the under-fit signature does (the policy
    that won every r5 A/B seed)."""
    from socialways_tpu.engine.rescue import StallTracker

    # flat but healthy-shaped evals: NEVER fires, at any count
    t = StallTracker(-1, classify_patience=2)
    assert not any(t.observe(0.10, ade_avg=0.18, train_ade=0.2)
                   for _ in range(40))
    # signature-matching flat evals: fires after classify_patience
    t = StallTracker(-1, classify_patience=2)
    assert not t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    assert not t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    assert t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    t.fired(0.20, at_epoch=3)
    assert t.fired_early == 1
    # patience 0 with classify armed is ALSO gated mode (no silent
    # inert combination): --ade-stall-classify alone works
    t0 = StallTracker(0, classify_patience=2)
    t0.observe(0.20, ade_avg=0.70, train_ade=0.63)
    t0.observe(0.20, ade_avg=0.70, train_ade=0.63)
    assert t0.observe(0.20, ade_avg=0.70, train_ade=0.63)
    assert t0.last_trigger == "classifier"
    # the ineffective-rescue cap still applies in gated mode
    t2 = StallTracker(-1, classify_patience=1, max_rescues=1)
    t2.observe(0.2, ade_avg=0.7, train_ade=0.6)       # sets bar
    assert t2.observe(0.2, ade_avg=0.7, train_ade=0.6)
    t2.fired(0.2, at_epoch=1)
    assert t2.observe(0.2, ade_avg=0.7, train_ade=0.6)
    assert t2.fired(0.2, at_epoch=2) == 1
    assert not any(t2.observe(0.2, ade_avg=0.7, train_ade=0.6)
                   for _ in range(5))                 # capped


def test_stall_tracker_collapse_signature():
    """The second stall class, found by the r5 out-of-sample seed
    extension (seed 9 / eth): min-of-K ~= avg-of-K (the K samples are
    near-identical -> diversity collapse) while the best is flat.  The
    under-fit gate (avg/min >= 3) is blind to it; the collapse gate
    (avg <= 1.2 x min, stalled) fires on the same classify_patience."""
    from socialways_tpu.engine.rescue import StallTracker

    # the measured seed-9/eth shape: min 0.69, avg 0.70 (ratio 1.01),
    # flat for many evals -> fires after classify_patience in gated mode
    t = StallTracker(-1, classify_patience=2)
    assert not t.observe(0.69, ade_avg=0.70, train_ade=0.50)  # sets bar
    assert not t.observe(0.69, ade_avg=0.70, train_ade=0.50)  # hit 1
    assert t.observe(0.69, ade_avg=0.70, train_ade=0.50)      # hit 2
    assert t.last_trigger == "classifier"
    assert t.last_signature == "collapse"
    t.fired(0.69, at_epoch=3)
    assert t.fired_early == 1

    # healthy late-run shape (avg/min ~2.4, the post-EMA floor): the
    # collapse gate never fires no matter how long the run idles
    t = StallTracker(-1, classify_patience=2)
    assert not any(t.observe(0.063, ade_avg=0.155, train_ade=0.16)
                   for _ in range(40))
    assert t.fired_early == 0

    # an IMPROVING collapsed run is left alone (min keeps dropping:
    # bar resets, streak resets — only a STALLED collapse fires)
    t = StallTracker(-1, classify_patience=2)
    for ade in (0.69, 0.60, 0.52, 0.45, 0.39):
        assert not t.observe(ade, ade_avg=ade * 1.02, train_ade=0.5)
    assert t.signature_hits == 0

    # the under-fit signature still reports its own label
    t = StallTracker(-1, classify_patience=2)
    t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    assert t.observe(0.20, ade_avg=0.70, train_ade=0.63)
    assert t.last_signature == "underfit"
