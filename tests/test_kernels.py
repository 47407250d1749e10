"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from socialways_tpu.config import TrainConfig
from socialways_tpu.kernels.social_attention import (
    _pallas_forward,
    _xla_reference,
)
from socialways_tpu.models import init_generator


def _setup(n, scene_size, key=0, hidden=64):
    cfg = TrainConfig(hidden_size=hidden, social_feature_size=hidden,
                      noise_len=hidden // 2)
    params = init_generator(jax.random.PRNGKey(key), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}
    rng = np.random.RandomState(key)
    x4 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(n, hidden).astype(np.float32))
    ids = jnp.asarray((np.arange(n) // scene_size).astype(np.int32))
    return p, x4, h, ids


def test_fused_matches_xla_multi_scene():
    p, x4, h, ids = _setup(200, 10)
    ref = _xla_reference(p, x4, h, ids)
    got = _pallas_forward(p, x4, h, ids, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_tile_shapes_and_mlp_chunks_match_xla():
    """Alternate (ti, tj) tile shapes and the chunked-MLP path (which
    enables lane-native 128x128 pair tiles within VMEM) are value-equal
    to the XLA reference."""
    p, x4, h, ids = _setup(200, 10, key=7)
    ref = np.asarray(_xla_reference(p, x4, h, ids))
    for ti, tj, ch in [(64, 128, 1), (128, 128, 2), (64, 64, 2)]:
        got = _pallas_forward(p, x4, h, ids, ti=ti, tj=tj, mlp_chunks=ch,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), ref,
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"tile {ti}x{tj}c{ch}")


def test_fused_handles_padding_and_singletons():
    p, x4, h, ids = _setup(100, 7, key=1)
    ids = np.asarray(ids).copy()
    ids[90:] = -1          # padding rows
    ids[89] = 999          # singleton scene
    ids = jnp.asarray(ids)
    got = np.asarray(_pallas_forward(p, x4, h, ids, interpret=True))
    ref = np.asarray(_xla_reference(p, x4, h, ids))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[90:], 0.0)
    np.testing.assert_allclose(got[89], 0.0)


def test_fused_gradients_via_xla_bwd():
    """custom_vjp backward == gradient of the XLA implementation."""
    from socialways_tpu.kernels.social_attention import social_attention_fused

    p, x4, h, ids = _setup(64, 8, key=2)

    import sys
    import socialways_tpu.kernels.social_attention  # noqa: F401
    sa = sys.modules["socialways_tpu.kernels.social_attention"]
    orig = sa._pallas_forward
    sa._pallas_forward = lambda *a, **k: orig(*a,
                                              **{**k, "interpret": True})
    try:
        def loss_fused(hh):
            return jnp.sum(social_attention_fused(p, x4, hh, ids) ** 2)

        def loss_ref(hh):
            return jnp.sum(_xla_reference(p, x4, hh, ids) ** 2)

        g1 = jax.grad(loss_fused)(h)
        g2 = jax.grad(loss_ref)(h)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-4)
    finally:
        sa._pallas_forward = orig


def test_generator_prepare_decode_equals_monolithic():
    from socialways_tpu.models.generator import (decode_rollout,
                                                 generator_rollout,
                                                 prepare_rollout)
    cfg = TrainConfig(hidden_size=32, social_feature_size=32, noise_len=16)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    obsv = jnp.asarray(rng.rand(6, 8, 2).astype(np.float32))
    noise = jnp.asarray(rng.rand(6, 16).astype(np.float32))
    ids = jnp.asarray(np.array([0, 0, 1, 1, 2, 2], np.int32))
    mono = generator_rollout(params, obsv, noise, 12, ids, use_social=True)
    prep = prepare_rollout(params, obsv, ids, use_social=True)
    split = decode_rollout(params, prep, noise, 12)
    np.testing.assert_allclose(np.asarray(mono), np.asarray(split),
                               rtol=1e-6)


def test_fused_attention_bf16_operands_close_to_f32():
    """bf16 inputs keep bf16 VMEM tiles (interpret mode): close to the f32
    reference within mixed-precision tolerance."""
    from socialways_tpu.kernels.social_attention import _pallas_forward
    from socialways_tpu.kernels.social_attention import _xla_reference

    params, x4, h, ids = _setup(200, 10)
    ref = np.asarray(_xla_reference(params, x4, h, ids), np.float32)
    got = _pallas_forward(params, x4, h.astype(jnp.bfloat16), ids,
                          interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               atol=0.05, rtol=0.05)


def test_pallas_backward_matches_xla_grads():
    """Fused Pallas backward (flash-style two-kernel) == XLA gradients,
    including padding rows, a singleton scene, and a zero-velocity agent
    (the safe-norm edge)."""
    import sys
    sa = sys.modules["socialways_tpu.kernels.social_attention"]

    p, x4, h, ids = _setup(200, 10, key=3)
    x4 = np.asarray(x4).copy()
    x4[5, 2:] = 0.0                  # stationary agent
    x4 = jnp.asarray(x4)
    ids = np.asarray(ids).copy()
    ids[190:] = -1                   # padding
    ids[189] = 999                   # singleton scene
    ids = jnp.asarray(ids)

    def loss(fn, p, x4, h):
        return jnp.sum(jnp.sin(fn(p, x4, h, ids)))

    gref = jax.grad(lambda *a: loss(sa._xla_reference, *a),
                    argnums=(0, 1, 2))(p, x4, h)

    orig_fwd, orig_flag = sa._pallas_forward, sa._BWD_INTERPRET
    sa._pallas_forward = lambda *a, **k: orig_fwd(
        *a, **{**k, "interpret": True})
    sa._BWD_INTERPRET = True
    try:
        gpal = jax.grad(lambda *a: loss(sa.social_attention_fused, *a),
                        argnums=(0, 1, 2))(p, x4, h)
    finally:
        sa._pallas_forward, sa._BWD_INTERPRET = orig_fwd, orig_flag

    for a, b in zip(gref, gpal):
        jax.tree_util.tree_map(
            lambda u, v: np.testing.assert_allclose(
                np.asarray(v), np.asarray(u), rtol=1e-4, atol=1e-5), a, b)
        assert all(bool(jnp.all(jnp.isfinite(x)))
                   for x in jax.tree_util.tree_leaves(b))


def test_fused_bf16_backward_uses_pallas_and_matches_f32_grads():
    """Under bf16 the custom_vjp NOW takes the Pallas backward (round-2
    session-3: the score recompute casts the f32 master weights to the
    forward's operand dtype inside the kernels, so the rebuilt attention
    renormalizes exactly against the bf16 forward's saved stats) — grads
    must be finite, f32-accumulated, and close to the f32 XLA reference
    within mixed-precision tolerance."""
    import sys
    sa = sys.modules["socialways_tpu.kernels.social_attention"]

    p, x4, h, ids = _setup(96, 8, key=4)
    # bf16 training casts ALL floating inputs (gan_step's cast)
    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    h16 = h.astype(jnp.bfloat16)
    x16 = x4.astype(jnp.bfloat16)
    assert sa._use_pallas_bwd(h16) or jax.default_backend() != "tpu"

    gref = jax.grad(lambda hh: jnp.sum(
        jnp.sin(sa._xla_reference(p, x4, hh, ids))))(h)

    orig_fwd, orig_flag = sa._pallas_forward, sa._BWD_INTERPRET
    sa._pallas_forward = lambda *a, **k: orig_fwd(
        *a, **{**k, "interpret": True})
    sa._BWD_INTERPRET = True
    called = []
    orig_bwd = sa._pallas_backward
    sa._pallas_backward = lambda *a, **k: called.append(1) or orig_bwd(
        *a, **k)
    try:
        g = jax.grad(lambda hh: jnp.sum(jnp.sin(
            sa.social_attention_fused(p16, x16, hh, ids)
            .astype(jnp.float32))))(h16)
    finally:
        sa._pallas_forward = orig_fwd
        sa._BWD_INTERPRET = orig_flag
        sa._pallas_backward = orig_bwd
    assert called                      # the Pallas backward kernels ran
    g32 = np.asarray(g, np.float32)
    assert np.isfinite(g32).all()
    np.testing.assert_allclose(g32, np.asarray(gref), atol=0.06, rtol=0.06)


def test_fused_fallback_backward_uses_windowed_when_bounded():
    """When the Pallas backward is unavailable (above the VMEM agent cap)
    and the caller bounds rows-per-scene, the fallback vjp must take the
    linear windowed form (ADVICE r1) — and its grads must match the
    blockwise fallback.  bf16 operands as in gan_step's cast."""
    import sys
    sa = sys.modules["socialways_tpu.kernels.social_attention"]
    from socialways_tpu.ops import social as social_xla

    p, x4, h, ids = _setup(96, 8, key=5)
    p16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    h16 = h.astype(jnp.bfloat16)
    x4 = x4.astype(jnp.bfloat16)
    orig_cap = sa._PALLAS_BWD_MAX_AGENTS
    sa._PALLAS_BWD_MAX_AGENTS = 0      # force the fallback backward
    assert not sa._use_pallas_bwd(h16)

    orig_fwd = sa._pallas_forward
    sa._pallas_forward = lambda *a, **k: orig_fwd(
        *a, **{**k, "interpret": True})
    called = []
    orig_win = social_xla.social_context_windowed
    social_xla.social_context_windowed = (
        lambda *a, **k: called.append(1) or orig_win(*a, **k))
    try:
        def loss(hh, max_scene):
            return jnp.sum(sa.social_attention_fused(
                p16, x4, hh, ids, max_scene).astype(jnp.float32))

        g_win = jax.grad(lambda hh: loss(hh, 8))(h16)
        assert called                       # windowed fallback exercised
        g_blk = jax.grad(lambda hh: loss(hh, 0))(h16)
    finally:
        sa._pallas_forward = orig_fwd
        sa._PALLAS_BWD_MAX_AGENTS = orig_cap
        social_xla.social_context_windowed = orig_win
    np.testing.assert_allclose(np.asarray(g_win.astype(jnp.float32)),
                               np.asarray(g_blk.astype(jnp.float32)),
                               rtol=2e-2, atol=2e-3)


def test_chunked_pallas_matches_windowed_xla_fwd_and_grads():
    """social_attention_chunked (fused kernel per row chunk with scene
    halos) == the windowed XLA form, forward and gradients, including the
    chunk-straddling scenes, a padding tail, and a final partial chunk."""
    import sys
    sa = sys.modules["socialways_tpu.kernels.social_attention"]
    from socialways_tpu.ops.social import social_context_windowed

    p, x4, h, ids = _setup(700, 10, key=5)
    ids = np.asarray(ids).copy()
    ids[690:] = -1                    # padding tail
    ids = jnp.asarray(ids)
    max_scene = 16

    orig = (sa._FWD_INTERPRET, sa._BWD_INTERPRET)
    sa._FWD_INTERPRET = sa._BWD_INTERPRET = True
    try:
        def loss_chunked(p, x4, h):
            out = sa.social_attention_chunked(p, x4, h, ids,
                                              max_scene, chunk=256)
            return jnp.sum(jnp.sin(out)), out

        def loss_ref(p, x4, h):
            out = social_context_windowed(p, x4, h, ids,
                                          max_scene=max_scene)
            return jnp.sum(jnp.sin(out)), out

        (l1, o1), g1 = jax.value_and_grad(loss_chunked, argnums=(0, 1, 2),
                                          has_aux=True)(p, x4, h)
        (l2, o2), g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2),
                                          has_aux=True)(p, x4, h)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(o1[690:]), 0.0)
        for a, b, name in [(g1[0], g2[0], "params"), (g1[1], g2[1], "x4"),
                           (g1[2], g2[2], "h")]:
            jax.tree_util.tree_map(
                lambda x, y: np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=2e-3, atol=2e-4,
                    err_msg=name), a, b)
    finally:
        sa._FWD_INTERPRET, sa._BWD_INTERPRET = orig


def test_dispatch_routes_large_n_to_chunked():
    """social_attention with use_pallas + n past the VMEM cap + bounded
    scenes routes through the chunked Pallas path (checked by value parity
    with a small artificial cap, interpret mode)."""
    import sys
    sa = sys.modules["socialways_tpu.kernels.social_attention"]
    from socialways_tpu.ops.social import social_context_windowed

    p, x4, h, ids = _setup(300, 10, key=6)
    orig = (sa._FWD_INTERPRET, sa._BWD_INTERPRET, sa._PALLAS_MAX_AGENTS,
            sa._PALLAS_BWD_MAX_AGENTS)
    sa._FWD_INTERPRET = sa._BWD_INTERPRET = True
    sa._PALLAS_MAX_AGENTS = 128       # force n=300 past the fused cap
    sa._PALLAS_BWD_MAX_AGENTS = 128   # chunked slices sized to this cap
    try:
        got = sa.social_attention(p, x4, h, ids, use_pallas=True,
                                  max_scene=16)
        ref = social_context_windowed(p, x4, h, ids, max_scene=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)
    finally:
        (sa._FWD_INTERPRET, sa._BWD_INTERPRET, sa._PALLAS_MAX_AGENTS,
         sa._PALLAS_BWD_MAX_AGENTS) = orig
