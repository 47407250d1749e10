"""Op tests against hand-written NumPy oracles and torch (CPU) references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socialways_tpu.ops import (
    attention_pool,
    get_traj_4d,
    linear_apply,
    linear_init,
    lstm_cell,
    lstm_init,
    lstm_seq,
    mlp_apply,
    mlp_init,
    obsv_to_4d,
    pred_to_4d,
    predict_cv,
    scene_mask,
    social_features,
    zero_state,
)


# ----------------------------------------------------------- traj 4d
def test_obsv_to_4d_matches_reference_rule():
    rng = np.random.RandomState(0)
    p = rng.randn(5, 8, 2).astype(np.float32)
    x4 = np.asarray(obsv_to_4d(jnp.asarray(p)))
    # velocity = backward diff, first repeated (train.py:131-133)
    v = p[:, 1:] - p[:, :-1]
    v = np.concatenate([v[:, :1], v], axis=1)
    np.testing.assert_allclose(x4[..., :2], p, rtol=1e-6)
    np.testing.assert_allclose(x4[..., 2:], v, rtol=1e-6)


def test_pred_to_4d_first_step_diffs_against_last_obs():
    rng = np.random.RandomState(1)
    obs = rng.randn(3, 8, 2).astype(np.float32)
    pred = rng.randn(3, 12, 2).astype(np.float32)
    _, p4 = get_traj_4d(jnp.asarray(obs), jnp.asarray(pred))
    p4 = np.asarray(p4)
    np.testing.assert_allclose(p4[:, 0, 2:], pred[:, 0] - obs[:, -1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p4[:, 1:, 2:], pred[:, 1:] - pred[:, :-1],
                               rtol=1e-5, atol=1e-6)


def test_predict_cv_oracle():
    obs = jnp.asarray([[[0., 0.], [1., 0.], [2., 0.], [3., 0.]]])
    out = np.asarray(predict_cv(obs, 3))
    # vel = (p[-1] - p[-3]) / 2 = (1, 0) / ... = ((3-1)/2, 0) = (1, 0)
    np.testing.assert_allclose(out[0, :, 0], [4., 5., 6.], atol=1e-6)
    np.testing.assert_allclose(out[0, :, 1], 0.0, atol=1e-6)
    # short history falls back to single diff
    out2 = np.asarray(predict_cv(obs[:, :2], 2))
    np.testing.assert_allclose(out2[0, :, 0], [2., 3.], atol=1e-6)


# ----------------------------------------------------- social features
def _numpy_social_oracle(x):
    """Literal transcription of the reference math (train.py:208-241)."""
    n = x.shape[0]
    feats = np.zeros((n, n, 3))
    for i in range(n):
        for j in range(n):
            dp = x[i, :2] - x[j, :2]
            dv = x[i, 2:] - x[j, 2:]
            dist = np.linalg.norm(dp)
            v = x[i, 2:]
            bearing = dp.dot(v) / (dist * np.linalg.norm(v) + 1e-6)
            ttca = -dp.dot(dv) / (dv.dot(dv) + 1e-6)
            dca = np.linalg.norm(dp + ttca * dv)
            feats[i, j] = [dist, bearing, dca]
    return feats


def test_social_features_vs_oracle():
    rng = np.random.RandomState(2)
    x = rng.randn(7, 4).astype(np.float32)
    got = np.asarray(social_features(jnp.asarray(x)))
    want = _numpy_social_oracle(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scene_mask():
    ids = jnp.asarray([0, 0, 1, -1, 1, 2])
    m = np.asarray(scene_mask(ids))
    assert m[0, 1] and m[1, 0]          # same scene
    assert m[2, 4] and m[4, 2]
    assert not m[0, 0]                  # self excluded
    assert not m[0, 2]                  # different scenes
    assert not m[3].any() and not m[:, 3].any()   # padding isolated
    assert not m[5].any()               # singleton scene → no neighbors


def test_attention_pool_vs_loop_oracle():
    """Vectorized masked attention == the reference's per-scene loops."""
    rng = np.random.RandomState(3)
    n, hd, fd = 6, 8, 8
    scene_ids = np.array([0, 0, 0, 1, 1, 2])
    f_emb = rng.randn(n, n, fd).astype(np.float32)
    h = rng.randn(n, hd).astype(np.float32)
    w = linear_init(jax.random.PRNGKey(0), hd, fd)

    got = np.asarray(attention_pool(
        w, jnp.asarray(f_emb), jnp.asarray(h),
        scene_mask(jnp.asarray(scene_ids))))

    # oracle: reference AttentionPooling.forward (train.py:160-175)
    wh = np.asarray(linear_apply(w, jnp.asarray(h)))  # [n, fd]
    S = np.zeros_like(h)
    sub_batches = [(0, 3), (3, 5), (5, 6)]
    for s, e in sub_batches:
        if e - s == 1:
            continue
        for i in range(s, e):
            sigma = np.array([f_emb[i, j].dot(wh[j]) for j in range(s, e)])
            sigma[i - s] = -1000.0
            a = np.exp(sigma - sigma.max())
            a /= a.sum()
            S[i] = a @ h[s:e]
    np.testing.assert_allclose(got, S, rtol=1e-4, atol=1e-5)


def test_attention_pool_padding_gets_zero():
    rng = np.random.RandomState(4)
    n = 4
    ids = jnp.asarray([0, 0, -1, -1])
    f = jnp.asarray(rng.randn(n, n, 8).astype(np.float32))
    h = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    w = linear_init(jax.random.PRNGKey(1), 8, 8)
    out = np.asarray(attention_pool(w, f, h, scene_mask(ids)))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[2:], 0.0)
    # with exactly one neighbor, attention weight is 1 on it
    np.testing.assert_allclose(out[0], np.asarray(h)[1], rtol=1e-5)


# ------------------------------------------------------------- LSTM
def test_lstm_cell_matches_torch():
    import torch

    hidden, in_dim, bs = 16, 4, 5
    p = lstm_init(jax.random.PRNGKey(0), in_dim, hidden)

    cell = torch.nn.LSTMCell(in_dim, hidden)
    w = np.asarray(p["w"])  # [in+h, 4h], gate order i,f,g,o (torch order)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(w[:in_dim].T.copy()))
        cell.weight_hh.copy_(torch.from_numpy(w[in_dim:].T.copy()))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["b"])))
        cell.bias_hh.zero_()

    rng = np.random.RandomState(5)
    x = rng.randn(bs, in_dim).astype(np.float32)
    h0 = rng.randn(bs, hidden).astype(np.float32)
    c0 = rng.randn(bs, hidden).astype(np.float32)

    h1, c1 = lstm_cell(p, jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0)))
    with torch.no_grad():
        th1, tc1 = cell(torch.from_numpy(x),
                        (torch.from_numpy(h0), torch.from_numpy(c0)))
    np.testing.assert_allclose(np.asarray(h1), th1.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), tc1.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_lstm_seq_equals_stepwise():
    hidden, in_dim, bs, T = 8, 4, 3, 6
    p = lstm_init(jax.random.PRNGKey(2), in_dim, hidden)
    xs = jnp.asarray(np.random.RandomState(6).randn(bs, T, in_dim)
                     .astype(np.float32))
    ys, (h, c) = lstm_seq(p, xs, zero_state(bs, hidden))
    state = zero_state(bs, hidden)
    for t in range(T):
        state = lstm_cell(p, xs[:, t], state)
        np.testing.assert_allclose(np.asarray(ys[:, t]),
                                   np.asarray(state[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(state[0]), rtol=1e-5)


# --------------------------------------------------------------- MLP
def test_mlp_shapes_and_activation():
    layers = mlp_init(jax.random.PRNGKey(3), [3, 32, 64, 16])
    x = jnp.ones((10, 3))
    y = mlp_apply(layers, x)
    assert y.shape == (10, 16)
    # final layer must NOT be ReLU'd: check negatives survive
    y2 = mlp_apply(layers, -100.0 * x)
    assert (np.asarray(y2) < 0).any() or (np.asarray(y2) != 0).any()


def test_linear_init_bounds():
    p = linear_init(jax.random.PRNGKey(4), 64, 32)
    bound = 1 / np.sqrt(64)
    assert np.abs(np.asarray(p["w"])).max() <= bound
    assert np.abs(np.asarray(p["b"])).max() <= bound


# ------------------------------------------------- blockwise social context
def test_blockwise_social_context_matches_dense():
    import jax
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.models import init_generator
    from socialways_tpu.kernels.social_attention import _xla_reference
    from socialways_tpu.ops.social import social_context_blockwise

    cfg = TrainConfig(hidden_size=32, social_feature_size=32)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}
    rng = np.random.RandomState(0)
    n = 150                       # deliberately not a multiple of block
    x4 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    ids = np.zeros(n, np.int32)
    ids[50:90] = 1                # scene spanning block boundary
    ids[120:121] = 7              # singleton
    ids[-6:] = -1                 # padding
    ids = jnp.asarray(ids)

    dense = _xla_reference(p, x4, h, ids)
    blk = social_context_blockwise(p, x4, h, ids, block=64)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)


def test_blockwise_social_context_gradients_match_dense():
    import jax
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.models import init_generator
    from socialways_tpu.kernels.social_attention import _xla_reference
    from socialways_tpu.ops.social import social_context_blockwise

    cfg = TrainConfig(hidden_size=16, social_feature_size=16)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}
    rng = np.random.RandomState(1)
    n = 96
    x4 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    ids = jnp.asarray((np.arange(n) // 12).astype(np.int32))

    def loss_dense(p, x4, h):
        return jnp.sum(_xla_reference(p, x4, h, ids) ** 2)

    def loss_blk(p, x4, h):
        return jnp.sum(social_context_blockwise(p, x4, h, ids, block=32)
                       ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(p, x4, h)
    gb = jax.grad(loss_blk, argnums=(0, 1, 2))(p, x4, h)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_windowed_social_context_matches_dense():
    import jax
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.models import init_generator
    from socialways_tpu.kernels.social_attention import _xla_reference
    from socialways_tpu.ops.social import social_context_windowed

    cfg = TrainConfig(hidden_size=32, social_feature_size=32)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}
    rng = np.random.RandomState(2)
    n = 500
    x4 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    # contiguous scenes of varying size <= 16, incl. one at a block edge
    sizes = [16, 7, 16, 16, 1, 16, 13] * 8
    ids = np.concatenate([[i] * s for i, s in enumerate(sizes)])[:n]
    ids = ids.astype(np.int32)
    ids[-5:] = -1
    ids = jnp.asarray(ids)

    dense = _xla_reference(p, x4, h, ids)
    win = social_context_windowed(p, x4, h, ids, max_scene=16, block=64)
    np.testing.assert_allclose(np.asarray(win), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)
    # gradient path
    g1 = jax.grad(lambda hh: jnp.sum(
        social_context_windowed(p, x4, hh, ids, max_scene=16, block=64)
        ** 2))(h)
    g2 = jax.grad(lambda hh: jnp.sum(
        _xla_reference(p, x4, hh, ids) ** 2))(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=5e-4, atol=5e-5)


def test_windowed_small_input_falls_back():
    import jax
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.models import init_generator
    from socialways_tpu.kernels.social_attention import _xla_reference
    from socialways_tpu.ops.social import social_context_windowed

    cfg = TrainConfig(hidden_size=16, social_feature_size=16)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}
    rng = np.random.RandomState(3)
    n = 40
    x4 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    ids = jnp.asarray((np.arange(n) // 8).astype(np.int32))
    dense = _xla_reference(p, x4, h, ids)
    win = social_context_windowed(p, x4, h, ids, max_scene=8, block=64)
    np.testing.assert_allclose(np.asarray(win), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)


def test_social_feature_grads_finite_despite_self_pairs():
    """safe_norm: dL/dx through the pairwise features is finite even though
    self-pairs have Δp = 0 (plain sqrt backward would give NaN there), and
    forward values are unchanged."""
    from socialways_tpu.ops.social import (safe_norm, social_features,
                                           social_context_blockwise)

    rng = np.random.RandomState(0)
    x4 = jnp.asarray(rng.randn(12, 4).astype(np.float32))
    feats = np.asarray(social_features(x4))
    # forward parity with the plain-norm definition
    dp = np.asarray(x4)[:, None, :2] - np.asarray(x4)[None, :, :2]
    np.testing.assert_allclose(feats[..., 0], np.linalg.norm(dp, axis=-1),
                               rtol=1e-6, atol=1e-6)
    assert float(safe_norm(jnp.zeros(3))) == 0.0

    g = jax.grad(lambda x: jnp.sum(jnp.tanh(social_features(x))))(x4)
    assert bool(jnp.all(jnp.isfinite(g)))

    from socialways_tpu.models import init_generator
    from socialways_tpu.config import TrainConfig
    cfg = TrainConfig(hidden_size=32, social_feature_size=32, noise_len=16)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}
    h = jnp.asarray(rng.randn(12, 32).astype(np.float32))
    ids = jnp.asarray(np.zeros(12, np.int32))
    g2 = jax.grad(lambda x: jnp.sum(
        social_context_blockwise(p, x, h, ids, block=8)))(x4)
    assert bool(jnp.all(jnp.isfinite(g2)))


class TestKalman:
    """Constant-acceleration KF/RTS (reference's dead MyKalman,
    linear_models.py:23-97, rebuilt live)."""

    def _noisy_line(self, seed=0, T=40, sigma=0.15):
        rng = np.random.RandomState(seed)
        t = np.arange(T, dtype=np.float32)
        truth = np.stack([0.3 * t, -0.2 * t + 1.0], axis=-1)
        return truth, truth + sigma * rng.randn(T, 2).astype(np.float32)

    def test_smoother_beats_measurements(self):
        from socialways_tpu.ops import kalman_filter, kalman_smooth
        truth, z = self._noisy_line()
        p_f, v_f = kalman_filter(jnp.asarray(z))
        p_s, v_s = kalman_smooth(jnp.asarray(z))
        err_meas = float(np.mean((z - truth) ** 2))
        err_smooth = float(np.mean((np.asarray(p_s) - truth) ** 2))
        assert err_smooth < 0.5 * err_meas
        # smoothed velocity tail near the true (0.3, -0.2); the reference's
        # Q (const-accel, x0.5) is deliberately loose, so check the mean and
        # a coarse per-step envelope rather than tight elementwise parity
        vm = np.asarray(v_s)[10:]
        np.testing.assert_allclose(vm.mean(axis=0), [0.3, -0.2], atol=0.05)
        assert float(np.abs(vm - [0.3, -0.2]).max()) < 0.15
        assert bool(jnp.all(jnp.isfinite(p_f))) and bool(
            jnp.all(jnp.isfinite(v_f)))

    def test_single_measurement_guard(self):
        from socialways_tpu.ops import kalman_smooth
        z = jnp.asarray(np.array([[2.0, 3.0]], np.float32))
        p, v = kalman_smooth(z)
        np.testing.assert_allclose(np.asarray(p), [[2.0, 3.0]])
        np.testing.assert_allclose(np.asarray(v), [[0.0, 0.0]])

    def test_predict_kalman_matches_cv_on_exact_line(self):
        from socialways_tpu.ops import predict_cv, predict_kalman
        t = np.arange(20, dtype=np.float32)
        obsv = jnp.asarray(np.stack([0.5 * t, 2.0 - 0.1 * t], axis=-1))
        pk = predict_kalman(obsv, 12)
        pcv = predict_cv(obsv, 12)
        # on an exact line the accel estimate decays to ~0 and the KF
        # forecast converges to the CV extrapolation
        np.testing.assert_allclose(np.asarray(pk), np.asarray(pcv),
                                   atol=0.01)

    def test_batched_and_jittable(self):
        from socialways_tpu.ops import kalman_smooth, predict_kalman
        rng = np.random.RandomState(1)
        z = jnp.asarray(rng.randn(3, 5, 20, 2).astype(np.float32))
        p, v = jax.jit(kalman_smooth)(z)
        assert p.shape == (3, 5, 20, 2) and v.shape == (3, 5, 20, 2)
        out = jax.jit(lambda x: predict_kalman(x, 4))(z)
        assert out.shape == (3, 5, 4, 2)
        assert bool(jnp.all(jnp.isfinite(out)))
