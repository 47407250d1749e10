"""Social interaction features and masked attention pooling.

Math parity with the reference (train.py:192-241 for the pairwise features,
train.py:153-175 for attention pooling), re-designed for XLA:

- the reference loops over scenes and agents in Python (an O(N²) eager-op
  hot spot); here a single batched NxN computation with a *scene-membership
  mask* replaces both the per-scene loop and the self-score ``-1000`` trick;
- padded samples (scene_id == -1) are masked out, so ragged scene batches
  run under one static shape.

Feature definitions, per ordered pair (i, j), on last-observed-frame states
x = (p, v):
- Euclidean distance ``‖p_i − p_j‖``
- bearing ``cosθ = (Δp·v_i) / (‖Δp‖‖v_i‖ + 1e-6)`` with Δp = p_i − p_j
- distance of closest approach ``‖Δp + ttca·Δv‖`` with
  ``ttca = −(Δp·Δv)/(‖Δv‖² + 1e-6)`` (un-clamped, as in the reference)
"""

from __future__ import annotations

import jax.numpy as jnp

from socialways_tpu.ops.nn import Params, linear_apply

_NEG_INF = -1e9


def safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """‖x‖ with a finite gradient at x = 0 (gradient 0 there).

    Forward-value-exact: equals jnp.linalg.norm everywhere.  The plain
    sqrt's backward is ±inf at 0, which turns the (masked!) self-pair
    entries of the pairwise features into NaN cotangents — harmless for
    parameter gradients (positions are data) but it poisons dL/dx for any
    downstream use; all pairwise norms here use this form instead.
    """
    sq = jnp.sum(x * x, axis=axis)
    return jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)


def social_features(x4d_last: jnp.ndarray) -> jnp.ndarray:
    """Pairwise social features from last-frame 4-D states.

    x4d_last: [N, 4] (px, py, vx, vy) → [N, N, 3] (dist, bearing, dca).
    Entry [i, j] describes agent j as seen from agent i.
    """
    p = x4d_last[:, :2]
    v = x4d_last[:, 2:]
    dp = p[:, None, :] - p[None, :, :]       # Δp[i,j] = p_i − p_j
    dv = v[:, None, :] - v[None, :, :]

    dist = safe_norm(dp)

    # bearing of j relative to i's heading
    dot_dp_v = jnp.einsum("ijk,ik->ij", dp, v)
    v_norm = safe_norm(v)
    bearing = dot_dp_v / (dist * v_norm[:, None] + 1e-6)

    # distance of closest approach under constant velocities
    dot_dp_dv = jnp.sum(dp * dv, axis=-1)
    dv_sq = jnp.sum(dv * dv, axis=-1) + 1e-6
    ttca = -dot_dp_dv / dv_sq
    dca = safe_norm(dp + ttca[..., None] * dv)

    return jnp.stack([dist, bearing, dca], axis=-1)


def scene_mask(scene_ids: jnp.ndarray) -> jnp.ndarray:
    """[N] int scene ids (−1 = padding) → [N, N] bool neighbor mask:
    same scene, both valid, i ≠ j.  Replaces the reference's per-scene loop
    bounds and N==1-scene skip (train.py:163-165)."""
    valid = scene_ids >= 0
    same = scene_ids[:, None] == scene_ids[None, :]
    both_valid = valid[:, None] & valid[None, :]
    not_self = ~jnp.eye(scene_ids.shape[0], dtype=bool)
    return same & both_valid & not_self


def attention_pool(w: Params, f_emb: jnp.ndarray, h: jnp.ndarray,
                   neighbor_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked social attention pooling (reference train.py:160-175).

    w: linear h_dim→f_dim; f_emb: [N, N, f] embedded pairwise features;
    h: [N, h] agent hidden states; neighbor_mask: [N, N] bool.

    Scores σ_ij = f_ij · (W h_j); masked softmax over each agent's scene
    neighbors; S_i = Σ_j attn_ij h_j.  Agents with no neighbors (singleton
    scenes or padding) get a zero vector, matching the reference's skip.
    """
    wh = linear_apply(w, h)                              # [N, f]
    scores = jnp.einsum("ijf,jf->ij", f_emb, wh)
    scores = jnp.where(neighbor_mask, scores, _NEG_INF)
    # numerically safe masked softmax
    scores_max = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.where(neighbor_mask,
                       jnp.exp(scores - scores_max), 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    attn = unnorm / jnp.maximum(denom, 1e-20)
    pooled = jnp.einsum("ij,jf->if", attn, h)
    has_neighbor = jnp.any(neighbor_mask, axis=-1, keepdims=True)
    return jnp.where(has_neighbor, pooled, 0.0)


def social_pool(w_params: Params, embed_fn, x4d_last: jnp.ndarray,
                h: jnp.ndarray, scene_ids: jnp.ndarray) -> jnp.ndarray:
    """Fused convenience path: features → embed → attention pooling."""
    feats = social_features(x4d_last)
    f_emb = embed_fn(feats)
    mask = scene_mask(scene_ids)
    return attention_pool(w_params, f_emb, h, mask)


def social_context_blockwise(params, x4_last: jnp.ndarray, h: jnp.ndarray,
                             scene_ids: jnp.ndarray,
                             block: int = 64) -> jnp.ndarray:
    """Memory-bounded social context: features + embed + masked softmax
    pooling, streamed over neighbor blocks.

    Same math as social_features → mlp_apply → attention_pool (exact up to
    float reassociation of the streaming softmax), but peak memory is
    O(N·block·F) instead of the dense form's O(N²·F) — the dense pairwise
    tensors need ~26 GB at N=10k, this needs ~170 MB at block=64.  The
    j-block loop is a ``lax.scan`` with the per-block body under
    ``jax.checkpoint``, so JAX differentiates it natively in bounded
    memory: this is the TRAINING path for crowd-scale social attention
    (and the backward used by the fused Pallas forward kernel).
    """
    import jax

    from socialways_tpu.ops.nn import linear_apply, mlp_apply

    n, hdim = h.shape
    n_pad = (-n) % block
    if n_pad:
        x4_p = jnp.concatenate(
            [x4_last, jnp.zeros((n_pad, 4), x4_last.dtype)])
        h_p = jnp.concatenate([h, jnp.zeros((n_pad, hdim), h.dtype)])
        ids_p = jnp.concatenate(
            [scene_ids, jnp.full((n_pad,), -1, scene_ids.dtype)])
    else:
        x4_p, h_p, ids_p = x4_last, h, scene_ids
    n_tot = n + n_pad

    p_i, v_i = x4_p[:, :2], x4_p[:, 2:]
    vi_norm = safe_norm(v_i)[:, None]
    row_g = jnp.arange(n_tot)[:, None]
    neg = jnp.asarray(-1e9, h_p.dtype)

    @jax.checkpoint
    def tile(carry, j0):
        m, l, acc = carry
        xj = jax.lax.dynamic_slice_in_dim(x4_p, j0, block)
        hj = jax.lax.dynamic_slice_in_dim(h_p, j0, block)
        idsj = jax.lax.dynamic_slice_in_dim(ids_p, j0, block)

        dp = p_i[:, None, :] - xj[None, :, :2]      # [n, block, 2]
        dv = v_i[:, None, :] - xj[None, :, 2:]
        dist = safe_norm(dp)
        bearing = jnp.einsum("ijk,ik->ij", dp, v_i) / (dist * vi_norm + 1e-6)
        ttca = -jnp.sum(dp * dv, axis=-1) / (jnp.sum(dv * dv, axis=-1)
                                             + 1e-6)
        dca = safe_norm(dp + ttca[..., None] * dv)

        f_emb = mlp_apply(params["feat_mlp"],
                          jnp.stack([dist, bearing, dca], axis=-1))
        whj = linear_apply(params["attn_w"], hj)    # [block, F]
        scores = jnp.einsum("ijf,jf->ij", f_emb, whj)

        col_g = (j0 + jnp.arange(block))[None, :]
        mask = ((ids_p[:, None] == idsj[None, :])
                & (ids_p[:, None] >= 0) & (idsj[None, :] >= 0)
                & (row_g != col_g))
        scores = jnp.where(mask, scores, neg)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.where(mask, jnp.exp(scores - m_new), 0.0)
        acc_new = acc * corr + p @ hj
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((n_tot, 1), neg, h_p.dtype)
    l0 = jnp.zeros((n_tot, 1), h_p.dtype)
    acc0 = jnp.zeros((n_tot, hdim), h_p.dtype)
    (m, l, acc), _ = jax.lax.scan(
        tile, (m0, l0, acc0), jnp.arange(0, n_tot, block))
    out = jnp.where(l > 0, acc / jnp.maximum(l, 1e-20), 0.0)
    return out[:n]


def social_context_windowed(params, x4_last: jnp.ndarray, h: jnp.ndarray,
                            scene_ids: jnp.ndarray, max_scene: int,
                            block: int = 512) -> jnp.ndarray:
    """Linear-time social context for sorted, contiguous, bounded scenes.

    Scene ids are sorted and contiguous (data.dataset packing /
    cli simulate layout), so every neighbor of row i lies within
    ``max_scene`` rows of i.  Each i-block therefore only scores a j-window
    of ``block + 2·max_scene`` rows around itself: O(N·max_scene) work and
    memory instead of the blockwise form's O(N²) work — the path to
    million-agent crowds.  Same math as the dense pipeline on the pairs
    that can exist; differentiable (plain scan + windowed gathers).

    ``max_scene`` is a static bound on rows-per-scene; rows of a scene
    split across the (rare) window edge are still correct because the
    window is centered on the i-block and covers max_scene rows on BOTH
    sides.
    """
    import jax

    from socialways_tpu.ops.nn import linear_apply, mlp_apply

    n, hdim = h.shape
    w = max_scene
    n_pad = (-n) % block
    n_tot = n + n_pad
    win = block + 2 * w
    if win >= n_tot:            # window would cover everything — stream
        return social_context_blockwise(params, x4_last, h, scene_ids,
                                        block=min(block, 256))
    if n_pad:
        x4_p = jnp.concatenate(
            [x4_last, jnp.zeros((n_pad, 4), x4_last.dtype)])
        h_p = jnp.concatenate([h, jnp.zeros((n_pad, hdim), h.dtype)])
        ids_p = jnp.concatenate(
            [scene_ids, jnp.full((n_pad,), -1, scene_ids.dtype)])
    else:
        x4_p, h_p, ids_p = x4_last, h, scene_ids

    wh_p = linear_apply(params["attn_w"], h_p)      # [n_tot, F], once
    neg = jnp.asarray(-1e9, h_p.dtype)

    # rematerialized per block: without this, the scan's vjp saves every
    # block's [block, win, F] intermediates (~10 GB at 65k agents) and the
    # backward stops compiling; with it, TRAINING memory is O(block·win·F)
    @jax.checkpoint
    def one_block(i0):
        xi = jax.lax.dynamic_slice_in_dim(x4_p, i0, block)
        idsi = jax.lax.dynamic_slice_in_dim(ids_p, i0, block)
        j0 = jnp.clip(i0 - w, 0, max(n_tot - win, 0))
        xj = jax.lax.dynamic_slice_in_dim(x4_p, j0, win)
        hj = jax.lax.dynamic_slice_in_dim(h_p, j0, win)
        whj = jax.lax.dynamic_slice_in_dim(wh_p, j0, win)
        idsj = jax.lax.dynamic_slice_in_dim(ids_p, j0, win)

        p_i, v_i = xi[:, :2], xi[:, 2:]
        dp = p_i[:, None, :] - xj[None, :, :2]      # [block, win, 2]
        dv = v_i[:, None, :] - xj[None, :, 2:]
        dist = safe_norm(dp)
        vi_norm = safe_norm(v_i)[:, None]
        bearing = jnp.einsum("ijk,ik->ij", dp, v_i) / (dist * vi_norm
                                                       + 1e-6)
        ttca = -jnp.sum(dp * dv, axis=-1) / (jnp.sum(dv * dv, axis=-1)
                                             + 1e-6)
        dca = safe_norm(dp + ttca[..., None] * dv)

        f_emb = mlp_apply(params["feat_mlp"],
                          jnp.stack([dist, bearing, dca], axis=-1))
        scores = jnp.einsum("ijf,jf->ij", f_emb, whj)

        row_g = (i0 + jnp.arange(block))[:, None]
        col_g = (j0 + jnp.arange(win))[None, :]
        mask = ((idsi[:, None] == idsj[None, :])
                & (idsi[:, None] >= 0) & (idsj[None, :] >= 0)
                & (row_g != col_g))
        scores = jnp.where(mask, scores, neg)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.where(mask, jnp.exp(scores - m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pooled = p @ hj
        return jnp.where(l > 0, pooled / jnp.maximum(l, 1e-20), 0.0)

    _, outs = jax.lax.scan(lambda c, i0: (c, one_block(i0)), 0,
                           jnp.arange(0, n_tot, block))
    return outs.reshape(n_tot, hdim)[:n]
