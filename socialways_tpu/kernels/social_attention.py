"""Fused social-attention Pallas TPU kernel.

Replaces the reference's hottest path — the O(N²) Python loops over scene
sub-batches computing pairwise features and attention (train.py:160-175,
229-241) — with ONE kernel that, per (i-tile, j-tile) of agent pairs:

1. computes the 3 social features (distance, bearing, DCA) on the fly,
2. pushes them through the 3→32→64→F embedding MLP (train.py:183-185),
3. scores σ_ij = f_ij · (W h_j) with scene-membership masking, and
4. accumulates a streaming (flash-style) masked softmax of h_j.

Pairwise features and embeddings are never materialized in HBM — at N
agents they would be N²·F floats (6.5 GB at N=10k, F=64); the kernel keeps
everything tile-resident in VMEM.  Tiles of agent pairs from different
scenes are skipped entirely: scene ids are contiguous by construction
(data.dataset packing), so a j-tile whose id range doesn't overlap the
i-tile's cannot contribute.

The wrapper is a ``jax.custom_vjp`` whose backward pass differentiates the
blockwise rematerialized form (ops.social.social_context_blockwise —
lax.scan over neighbor blocks with jax.checkpoint) under ``jax.vjp``:
exact gradients in O(N·block) memory, so TRAINING with social attention
also works at crowd scale where the dense pairwise tensors would need
~26 GB.

REQUIREMENT: scene ids must be sorted non-decreasing with padding (−1) at
the end — exactly what ``data.dataset.pack_scene_batches`` produces.  The
per-i-tile j-band skip logic depends on it; unsorted ids would silently
drop cross-tile pairs (use ops.social directly for arbitrary orderings).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from socialways_tpu.ops import social as social_xla
from socialways_tpu.ops.nn import mlp_apply

_NEG = -1e9


def _kernel(jstart_ref, jend_ref, x4_ref, ids_ref, h_ref, wh_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, *, ti: int, tj: int, n: int, feat: int):
    """Grid: (n // ti,). Full x4/ids/h/wh live in VMEM; the i-tile of the
    output is blocked.  jstart/jend (scalar-prefetched) bound the j-tile
    band per i-tile: scene ids are sorted, so only a contiguous run of
    j-tiles can share a scene with this i-tile — all others are skipped
    without even a loop iteration."""
    i = pl.program_id(0)
    i0 = i * ti

    xi = x4_ref[pl.ds(i0, ti), :]                    # [ti, 4]
    ids_i = ids_ref[pl.ds(i0, ti), :]                # [ti, 1] int32
    pix, piy = xi[:, 0:1], xi[:, 1:2]
    vix, viy = xi[:, 2:3], xi[:, 3:4]
    vi_norm = jnp.sqrt(vix * vix + viy * viy)        # [ti, 1]

    row_g = i0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)

    def j_body(jt, carry):
        m, l, acc = carry
        j0 = jt * tj
        xj = x4_ref[pl.ds(j0, tj), :]                # [tj, 4]
        ids_j = ids_ref[pl.ds(j0, tj), :]            # [tj, 1]

        # pairwise deltas as 2-D [ti, tj] planes (i = row, j = col)
        dpx = pix - xj[:, 0][None, :]
        dpy = piy - xj[:, 1][None, :]
        dvx = vix - xj[:, 2][None, :]
        dvy = viy - xj[:, 3][None, :]

        dist = jnp.sqrt(dpx * dpx + dpy * dpy)
        # bearing: cos angle between Δp and v_i (train.py:221-226)
        bearing = (dpx * vix + dpy * viy) / (dist * vi_norm + 1e-6)
        # DCA (train.py:208-218)
        ttca = -(dpx * dvx + dpy * dvy) / (dvx * dvx + dvy * dvy + 1e-6)
        cax = dpx + ttca * dvx
        cay = dpy + ttca * dvy
        dca = jnp.sqrt(cax * cax + cay * cay)

        # embed: [ti*tj, 3] → MLP → [ti*tj, feat].  Matmul operands follow
        # the weight dtype (bf16 under mixed precision — MXU-native, and
        # halves the VMEM residents); accumulation + activations stay f32
        op_dt = w1_ref.dtype
        f = jnp.stack([dist, bearing, dca], axis=-1).reshape(ti * tj, 3)
        f = jnp.maximum(
            jnp.dot(f.astype(op_dt), w1_ref[:],
                    preferred_element_type=jnp.float32)
            + b1_ref[:].astype(jnp.float32), 0.0)
        f = jnp.maximum(
            jnp.dot(f.astype(op_dt), w2_ref[:],
                    preferred_element_type=jnp.float32)
            + b2_ref[:].astype(jnp.float32), 0.0)
        f = (jnp.dot(f.astype(op_dt), w3_ref[:],
                     preferred_element_type=jnp.float32)
             + b3_ref[:].astype(jnp.float32))    # [ti*tj, feat] f32

        # scores σ_ij = f_ij · wh_j
        whj = wh_ref[pl.ds(j0, tj), :].astype(jnp.float32)   # [tj, feat]
        whj_rep = jnp.broadcast_to(whj[None, :, :], (ti, tj, feat)
                                   ).reshape(ti * tj, feat)
        scores = jnp.sum(f * whj_rep, axis=-1).reshape(ti, tj)

        # scene mask: same id, both valid, not self
        same = ids_i == ids_j[:, 0][None, :]
        valid = jnp.logical_and(ids_i >= 0, ids_j[:, 0][None, :] >= 0)
        col_g = j0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
        not_self = row_g != col_g
        mask = jnp.logical_and(jnp.logical_and(same, valid), not_self)
        scores = jnp.where(mask, scores, _NEG)

        # streaming softmax update
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.where(mask, jnp.exp(scores - m_new), 0.0)
        hj = h_ref[pl.ds(j0, tj), :]             # [tj, H] (operand dtype)
        acc_new = acc * corr + jnp.dot(
            p.astype(hj.dtype), hj, preferred_element_type=jnp.float32)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        return m_new, l_new, acc_new

    hdim = h_ref.shape[-1]
    m0 = jnp.full((ti, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((ti, 1), jnp.float32)
    acc0 = jnp.zeros((ti, hdim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(jstart_ref[i], jend_ref[i] + 1, j_body,
                                  (m0, l0, acc0))

    # agents with no neighbors (singleton scenes / padding) → zero vector
    out_ref[:] = jnp.where(l > 0, acc / jnp.maximum(l, 1e-20), 0.0)


def _pallas_forward(params: Dict, x4_last: jnp.ndarray, h: jnp.ndarray,
                    scene_ids: jnp.ndarray, *, ti: int = 128,
                    tj: int = 64, interpret: bool = False) -> jnp.ndarray:
    n, hdim = h.shape
    feat = params["attn_w"]["w"].shape[1]

    # pad the agent axis to a tile multiple; padding gets scene id −1
    tile = max(ti, tj)
    n_pad = (-n) % tile
    if n_pad:
        x4_last = jnp.concatenate(
            [x4_last, jnp.zeros((n_pad, 4), x4_last.dtype)])
        h_p = jnp.concatenate([h, jnp.zeros((n_pad, hdim), h.dtype)])
        scene_ids = jnp.concatenate(
            [scene_ids, jnp.full((n_pad,), -1, scene_ids.dtype)])
    else:
        h_p = h
    n_tot = n + n_pad

    # operand dtype: bf16 inputs stay bf16 in VMEM (halves the resident
    # h/wh arrays — doubling the kernel's agent capacity — and feeds the
    # MXU bf16 operands); everything else runs f32
    op_dt = jnp.bfloat16 if h.dtype == jnp.bfloat16 else jnp.float32
    wh = (jnp.dot(h_p.astype(jnp.float32),
                  params["attn_w"]["w"].astype(jnp.float32))
          + params["attn_w"]["b"].astype(jnp.float32)).astype(op_dt)
    w1, w2, w3 = [jax.tree_util.tree_map(lambda x: x.astype(op_dt), w)
                  for w in params["feat_mlp"]]
    ids2d = scene_ids.astype(jnp.int32).reshape(n_tot, 1)

    # per-i-tile j-tile band: scene ids are sorted (padding −1 at the end is
    # remapped to a +sentinel so the order stays monotone); tile jt overlaps
    # i-tile it iff [jmin, jmax] ∩ [imin, imax] ≠ ∅, which for sorted ids is
    # a contiguous band — computed here in XLA and scalar-prefetched
    sent = jnp.where(scene_ids >= 0, scene_ids.astype(jnp.int32),
                     jnp.iinfo(jnp.int32).max)
    i_min = sent.reshape(n_tot // ti, ti).min(axis=1)
    i_max = sent.reshape(n_tot // ti, ti).max(axis=1)
    j_min = sent.reshape(n_tot // tj, tj).min(axis=1)
    j_max = sent.reshape(n_tot // tj, tj).max(axis=1)
    # first jt with j_max[jt] >= i_min[it]; last jt with j_min[jt] <= i_max[it]
    jstart = jnp.searchsorted(j_max, i_min, side="left").astype(jnp.int32)
    jend = (jnp.searchsorted(j_min, i_max, side="right") - 1).astype(
        jnp.int32)
    n_jt = n_tot // tj
    jstart = jnp.clip(jstart, 0, n_jt - 1)
    jend = jnp.clip(jend, jstart, n_jt - 1)

    kern = functools.partial(_kernel, ti=ti, tj=tj, n=n_tot, feat=feat)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tot // ti,),
            in_specs=[
            pl.BlockSpec((n_tot, 4), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tot, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tot, hdim), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tot, feat), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1["w"].shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1["b"].shape, lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2["w"].shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2["b"].shape, lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3["w"].shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3["b"].shape, lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ti, hdim), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tot, hdim), jnp.float32),
        interpret=interpret,
    )(jstart, jend,
      x4_last.astype(jnp.float32), ids2d, h_p.astype(op_dt), wh,
      w1["w"], w1["b"], w2["w"], w2["b"], w3["w"], w3["b"])
    return out[:n].astype(h.dtype)


def _xla_reference(params: Dict, x4_last, h, scene_ids):
    feats = social_xla.social_features(x4_last)
    f_emb = mlp_apply(params["feat_mlp"], feats)
    return social_xla.attention_pool(params["attn_w"], f_emb, h,
                                     social_xla.scene_mask(scene_ids))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def social_attention_fused(params: Dict, x4_last: jnp.ndarray,
                           h: jnp.ndarray, scene_ids: jnp.ndarray
                           ) -> jnp.ndarray:
    """Fused features→embed→pool. Same math as ops.social (±1e-5)."""
    return _pallas_forward(params, x4_last, h, scene_ids)


def _fwd(params, x4_last, h, scene_ids):
    out = _pallas_forward(params, x4_last, h, scene_ids)
    return out, (params, x4_last, h, scene_ids)


def _bwd(res, g):
    # blockwise rematerialized backward: O(N·block) memory, so training
    # with social attention works at crowd scale (the dense reference's
    # backward needs the full N²·F pairwise tensors — ~26 GB at N=10k)
    params, x4_last, h, scene_ids = res
    _, vjp = jax.vjp(
        lambda p, x, hh: social_xla.social_context_blockwise(
            p, x, hh, scene_ids, block=256), params, x4_last, h)
    dp, dx, dh = vjp(g)
    return dp, dx, dh, None


social_attention_fused.defvjp(_fwd, _bwd)


# the fused kernel keeps the full (x4, ids, h, Wh) arrays VMEM-resident.
# Measured on v5e at H=64: standalone the kernel compiles to 40960 agents
# f32 / 57344 bf16, but COMPOSED inside a larger program (the sim's
# window scan) the output buffer lands on the same scoped-VMEM stack and
# 40960 f32 overflows (20 MB > 16 MB).  Caps below are composed-safe:
# ~(x4 16B + ids 4B + (h + Wh + out)·itemsize·H)/agent + pair tiles.
_PALLAS_MAX_AGENTS = 16384
_PALLAS_MAX_AGENTS_BF16 = 32768
# above this the DENSE XLA form's N²·F pairwise tensors stop being a good
# idea (≥1 GB at F=64) — stream blocks instead
_DENSE_MAX_AGENTS = 4096


def social_attention(params: Dict, x4_last, h, scene_ids,
                     use_pallas: bool = False,
                     max_scene: int = 0) -> jnp.ndarray:
    """Size-aware dispatch.

    - Pallas fused kernel: requested + TPU + fits VMEM (≤16k agents);
    - windowed XLA (O(N·max_scene) work — LINEAR in N): larger inputs
      when the caller can bound rows-per-scene (``max_scene > 0``; ids
      sorted + contiguous) — the path to million-agent crowds;
    - blockwise streamed XLA (O(N²) work, O(N·block) memory): larger
      inputs with unbounded scenes;
    - dense XLA reference: small inputs (fewer, fatter ops win there).
    """
    n = h.shape[0]
    cap = (_PALLAS_MAX_AGENTS_BF16 if h.dtype == jnp.bfloat16
           else _PALLAS_MAX_AGENTS)
    if use_pallas and jax.default_backend() == "tpu" and n <= cap:
        return social_attention_fused(params, x4_last, h, scene_ids)
    if n > _DENSE_MAX_AGENTS:
        if max_scene > 0:
            return social_xla.social_context_windowed(
                params, x4_last, h, scene_ids, max_scene=max_scene)
        return social_xla.social_context_blockwise(params, x4_last, h,
                                                   scene_ids, block=256)
    return _xla_reference(params, x4_last, h, scene_ids)
