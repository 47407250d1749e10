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

The wrapper is a ``jax.custom_vjp``.  The backward is a flash-style pair
of Pallas kernels (dq + dkv, like flash attention's backward split): each
recomputes the pair scores per tile from the forward's saved softmax
stats (m, l) and pulls the score cotangent back through the SAME
``_pair_embed`` the forward used via ``jax.vjp`` inside the kernel — so
feature/MLP gradients are exact by construction, in O(tile) memory, and
scene-band skipping cuts the pair count exactly like the forward.
Measured (v5e, H=64, fwd+bwd): 1.3-1.6× the windowed-XLA vjp and 8.4× the
blockwise-remat vjp at 8k agents / 64-agent scenes; the one regime it
loses is a single DENSE scene spanning most of the batch (the band skips
nothing, and XLA's big batched matmuls win — ~10×; bounded, and not a
Social-Ways workload).  Dtype-consistent in both precisions: the score
recompute casts the f32 master weights/operands to the FORWARD's operand
dtype inside the vjp'd function, so under bf16 the rebuilt scores equal
the bf16 forward's and renormalize exactly against its saved (m, l),
while every cotangent accumulates in f32 (the cast's vjp is a cast back).
Above ``_PALLAS_BWD_MAX_AGENTS`` the backward
falls to the blockwise rematerialized XLA form
(ops.social.social_context_blockwise under ``jax.vjp``): exact gradients
in O(N·block) memory, so TRAINING with social attention also works at
crowd scale where the dense pairwise tensors would need ~26 GB.

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


def _snorm(sq):
    """sqrt with a finite gradient at 0 — value-exact (sqrt(0) = 0), but
    backward 0 instead of NaN at the masked self-pairs where the squared
    quantity is exactly 0.  Mirrors ops.social.safe_norm."""
    return jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)


def _pair_embed(xi, xj, w1, b1, w2, b2, w3, b3):
    """Embedded pairwise features f_ij [ti*tj, F] (f32) from raw tiles.

    xi [ti, 4] f32 (query agents), xj [tj, 4] f32 (neighbor agents), MLP
    weights in operand dtype.  Shared by the forward kernel and BOTH
    backward kernels (which differentiate it per tile with jax.vjp), so
    the recomputed math is identical by construction.  Same features /
    epsilons as ops.social (reference train.py:208-226).

    The final score contraction s_ij = f_ij · wh_j is deliberately OUTSIDE
    this function: its vjp needs a [ti, tj] → [ti·tj, 1] lane-collapsing
    reshape Mosaic can't lower, so the backward kernels do that one step
    by hand (3-D elementwise forms) and jax.vjp only through here."""
    ti, tj = xi.shape[0], xj.shape[0]
    pix, piy = xi[:, 0:1], xi[:, 1:2]
    vix, viy = xi[:, 2:3], xi[:, 3:4]
    vi_norm = _snorm(vix * vix + viy * viy)          # [ti, 1]

    dpx = pix - xj[:, 0][None, :]
    dpy = piy - xj[:, 1][None, :]
    dvx = vix - xj[:, 2][None, :]
    dvy = viy - xj[:, 3][None, :]

    dist = _snorm(dpx * dpx + dpy * dpy)
    bearing = (dpx * vix + dpy * viy) / (dist * vi_norm + 1e-6)
    ttca = -(dpx * dvx + dpy * dvy) / (dvx * dvx + dvy * dvy + 1e-6)
    cax = dpx + ttca * dvx
    cay = dpy + ttca * dvy
    dca = _snorm(cax * cax + cay * cay)

    op_dt = w1.dtype
    f = jnp.stack([dist, bearing, dca], axis=-1).reshape(ti * tj, 3)
    f = jnp.maximum(
        jnp.dot(f.astype(op_dt), w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32), 0.0)
    f = jnp.maximum(
        jnp.dot(f.astype(op_dt), w2, preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32), 0.0)
    return (jnp.dot(f.astype(op_dt), w3, preferred_element_type=jnp.float32)
            + b3.astype(jnp.float32))                # [ti*tj, feat] f32


def _pair_scores(xi, xj, whj, w1, b1, w2, b2, w3, b3):
    """Unmasked pair scores s_ij [ti, tj] (f32): embed + contract."""
    ti, tj = xi.shape[0], xj.shape[0]
    feat = whj.shape[-1]
    f = _pair_embed(xi, xj, w1, b1, w2, b2, w3, b3)
    whj_rep = jnp.broadcast_to(
        whj.astype(jnp.float32)[None, :, :], (ti, tj, feat)
    ).reshape(ti * tj, feat)
    return jnp.sum(f * whj_rep, axis=-1).reshape(ti, tj)


def _pair_scores_chunked(xi, xj, whj, w1, b1, w2, b2, w3, b3,
                         n_chunks: int):
    """_pair_scores with the i-rows split into ``n_chunks`` static chunks:
    the [ti·tj, ·] MLP intermediates only ever cover one chunk, so a
    lane-native [128, 128] pair tile fits VMEM (the un-chunked form is
    capped at ti·tj ≤ 8192 by those intermediates)."""
    if n_chunks == 1:
        return _pair_scores(xi, xj, whj, w1, b1, w2, b2, w3, b3)
    ti = xi.shape[0]
    tc = ti // n_chunks
    return jnp.concatenate(
        [_pair_scores(xi[c * tc:(c + 1) * tc], xj, whj,
                      w1, b1, w2, b2, w3, b3)
         for c in range(n_chunks)], axis=0)


def _mask_tile(ids_i, ids_j, i0, j0, ti, tj):
    """Scene-membership mask for one [ti, tj] pair tile (same id, both
    valid, not self — replaces the reference's −1000 trick and N==1 skip,
    train.py:165,170)."""
    same = ids_i == ids_j[:, 0][None, :]
    valid = jnp.logical_and(ids_i >= 0, ids_j[:, 0][None, :] >= 0)
    row_g = i0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    col_g = j0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    return jnp.logical_and(jnp.logical_and(same, valid), row_g != col_g)


def _kernel(jstart_ref, jend_ref, x4_ref, ids_ref, h_ref, wh_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, stats_ref, *, ti: int, tj: int, n: int, feat: int,
            mlp_chunks: int = 1):
    """Grid: (n // ti,). Full x4/ids/h/wh live in VMEM; the i-tile of the
    output is blocked.  jstart/jend (scalar-prefetched) bound the j-tile
    band per i-tile: scene ids are sorted, so only a contiguous run of
    j-tiles can share a scene with this i-tile — all others are skipped
    without even a loop iteration.  stats (softmax max m and normalizer l
    per row) are emitted for the flash-style backward kernels."""
    i = pl.program_id(0)
    i0 = i * ti

    xi = x4_ref[pl.ds(i0, ti), :]                    # [ti, 4]
    ids_i = ids_ref[pl.ds(i0, ti), :]                # [ti, 1] int32

    def j_body(jt, carry):
        m, l, acc = carry
        j0 = jt * tj
        xj = x4_ref[pl.ds(j0, tj), :]                # [tj, 4]
        ids_j = ids_ref[pl.ds(j0, tj), :]            # [tj, 1]
        whj = wh_ref[pl.ds(j0, tj), :]               # [tj, feat]

        scores = _pair_scores_chunked(xi, xj, whj, w1_ref[:], b1_ref[:],
                                      w2_ref[:], b2_ref[:], w3_ref[:],
                                      b3_ref[:], mlp_chunks)
        mask = _mask_tile(ids_i, ids_j, i0, j0, ti, tj)
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
    stats_ref[:] = jnp.concatenate([m, l], axis=-1)


def _tile_bands(sent: jnp.ndarray, n_tot: int, trow: int, tcol: int):
    """For each trow-sized tile of rows, the [start, end] range of
    tcol-sized column tiles whose sentinel-id range overlaps it.  Ids are
    sorted (padding remapped to +sentinel), so the overlap set is a
    contiguous band; computed in XLA and scalar-prefetched."""
    r_min = sent.reshape(n_tot // trow, trow).min(axis=1)
    r_max = sent.reshape(n_tot // trow, trow).max(axis=1)
    c_min = sent.reshape(n_tot // tcol, tcol).min(axis=1)
    c_max = sent.reshape(n_tot // tcol, tcol).max(axis=1)
    start = jnp.searchsorted(c_max, r_min, side="left").astype(jnp.int32)
    end = (jnp.searchsorted(c_min, r_max, side="right") - 1).astype(
        jnp.int32)
    n_ct = n_tot // tcol
    start = jnp.clip(start, 0, n_ct - 1)
    end = jnp.clip(end, start, n_ct - 1)
    return start, end


def _pallas_forward(params: Dict, x4_last: jnp.ndarray, h: jnp.ndarray,
                    scene_ids: jnp.ndarray, *, ti: int = 0,
                    tj: int = 64, mlp_chunks: int = 1,
                    interpret: bool = False,
                    with_stats: bool = False):
    n, hdim = h.shape
    feat = params["attn_w"]["w"].shape[1]
    if not ti:
        # tile A/B (benchmarks/attention_tile_ab_r2s4.json, …_r2s5_*.json):
        # f32 in its dispatch range (≤16k agents) runs fastest with 64×64
        # tiles (0.28 vs 0.35 ms at 10k/scene-64) and compiles ~2× faster;
        # bf16 — whose point is the 32k capacity regime — wins with 128×64
        # there (0.94 vs 1.06 ms).  with_stats keeps ti=128 so the padded
        # out/stats stay aligned to the backward pair's tile_big=128.
        ti = 128 if (with_stats or h.dtype == jnp.bfloat16) else 64

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
    jstart, jend = _tile_bands(sent, n_tot, ti, tj)

    kern = functools.partial(_kernel, ti=ti, tj=tj, n=n_tot, feat=feat,
                             mlp_chunks=mlp_chunks)
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
            out_specs=[
                pl.BlockSpec((ti, hdim), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ti, 2), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_tot, hdim), jnp.float32),
                   jax.ShapeDtypeStruct((n_tot, 2), jnp.float32)],
        interpret=interpret,
    )(jstart, jend,
      x4_last.astype(jnp.float32), ids2d, h_p.astype(op_dt), wh,
      w1["w"], w1["b"], w2["w"], w2["b"], w3["w"], w3["b"])
    out, stats = out
    if with_stats:
        # padded full-length out (f32) + per-row softmax stats, for the
        # Pallas backward kernels
        return out, stats
    return out[:n].astype(h.dtype)


def _bwd_dq_kernel(jstart_ref, jend_ref, x4_ref, ids_ref, h_ref, wh_ref,
                   g_ref, stats_ref, r_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                   dxi_ref, *, ti: int, tj: int, op_dt):
    """Query-side backward: dL/dx_i.  Grid over i-tiles; per j-tile in the
    scene band, recompute the pair scores (via the SAME _pair_scores the
    forward ran), rebuild a_ij from the saved softmax stats, form
    dσ_ij = a_ij (g_i·h_j − g_i·out_i), and pull it back through the score
    computation w.r.t. x_i with jax.vjp — the feature/MLP gradients are
    exact by construction, no hand-derived derivatives.

    ``op_dt`` is the FORWARD's operand dtype: the f32 master weights are
    cast to it inside the vjp'd function so the recomputed scores are
    bit-identical to the forward's (bf16 forward → bf16 recompute) and the
    saved (m, l) stats renormalize exactly; cotangents stay f32."""
    i = pl.program_id(0)
    i0 = i * ti
    xi = x4_ref[pl.ds(i0, ti), :]
    ids_i = ids_ref[pl.ds(i0, ti), :]
    gi = g_ref[pl.ds(i0, ti), :]                     # [ti, H] f32
    st = stats_ref[pl.ds(i0, ti), :]
    mi, li = st[:, 0:1], st[:, 1:2]
    ri = r_ref[pl.ds(i0, ti), :]                     # [ti, 1] g·out
    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    w3, b3 = w3_ref[:], b3_ref[:]

    def j_body(jt, dxi):
        j0 = jt * tj
        xj = x4_ref[pl.ds(j0, tj), :]
        ids_j = ids_ref[pl.ds(j0, tj), :]
        hj = h_ref[pl.ds(j0, tj), :].astype(jnp.float32)
        whj = wh_ref[pl.ds(j0, tj), :].astype(jnp.float32)
        feat = whj.shape[-1]
        f, vjp_fn = jax.vjp(
            lambda xi_: _pair_embed(xi_, xj, w1.astype(op_dt),
                                    b1.astype(op_dt), w2.astype(op_dt),
                                    b2.astype(op_dt), w3.astype(op_dt),
                                    b3.astype(op_dt)), xi)
        f3 = f.reshape(ti, tj, feat)
        s = jnp.sum(f3 * whj[None, :, :], axis=-1)   # [ti, tj]
        mask = _mask_tile(ids_i, ids_j, i0, j0, ti, tj)
        p = jnp.where(mask, jnp.exp(s - mi), 0.0)
        a = p / jnp.maximum(li, 1e-20)
        gh = jnp.dot(gi, hj.T, preferred_element_type=jnp.float32)
        ds = a * (gh - ri)
        # hand-written contraction backward (Mosaic-friendly 3-D forms)
        df = (ds[:, :, None] * whj[None, :, :]).reshape(ti * tj, feat)
        (dxi_c,) = vjp_fn(df)
        return dxi + dxi_c

    dxi_ref[:] = jax.lax.fori_loop(jstart_ref[i], jend_ref[i] + 1, j_body,
                                   jnp.zeros((ti, 4), jnp.float32))


def _bwd_dkv_kernel(istart_ref, iend_ref, x4_ref, ids_ref, h_ref, wh_ref,
                    g_ref, stats_ref, r_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                    dxj_ref, dhj_ref, dwhj_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
                    *, ti: int, tj: int, op_dt):
    """Neighbor-side backward: dL/dx_j, dL/dh_j (value path), dL/d(Wh)_j,
    and the feature-MLP weight gradients.  Grid over j-tiles; per i-tile in
    the TRANSPOSED scene band each ordered pair (i, j) is visited exactly
    once, so the weight grads accumulate across the sequential TPU grid
    into constant-index output blocks.  ``op_dt`` as in _bwd_dq_kernel:
    weights cast to the forward's operand dtype inside the vjp'd function,
    f32 cotangents."""
    jt = pl.program_id(0)
    j0 = jt * tj
    xj = x4_ref[pl.ds(j0, tj), :]
    ids_j = ids_ref[pl.ds(j0, tj), :]
    hj = h_ref[pl.ds(j0, tj), :].astype(jnp.float32)
    whj = wh_ref[pl.ds(j0, tj), :]
    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    w3, b3 = w3_ref[:], b3_ref[:]
    hdim = h_ref.shape[-1]
    feat = wh_ref.shape[-1]

    def i_body(it, carry):
        dxj, dhj, dwhj, dw1, db1, dw2, db2, dw3, db3 = carry
        i0 = it * ti
        xi = x4_ref[pl.ds(i0, ti), :]
        ids_i = ids_ref[pl.ds(i0, ti), :]
        gi = g_ref[pl.ds(i0, ti), :]
        st = stats_ref[pl.ds(i0, ti), :]
        mi, li = st[:, 0:1], st[:, 1:2]
        ri = r_ref[pl.ds(i0, ti), :]
        f, vjp_fn = jax.vjp(
            lambda xj_, w1_, b1_, w2_, b2_, w3_, b3_: _pair_embed(
                xi, xj_, w1_.astype(op_dt), b1_.astype(op_dt),
                w2_.astype(op_dt), b2_.astype(op_dt),
                w3_.astype(op_dt), b3_.astype(op_dt)),
            xj, w1, b1, w2, b2, w3, b3)
        feat = whj.shape[-1]
        whjf = whj.astype(jnp.float32)
        f3 = f.reshape(ti, tj, feat)
        s = jnp.sum(f3 * whjf[None, :, :], axis=-1)  # [ti, tj]
        mask = _mask_tile(ids_i, ids_j, i0, j0, ti, tj)
        p = jnp.where(mask, jnp.exp(s - mi), 0.0)
        a = p / jnp.maximum(li, 1e-20)               # [ti, tj]
        gh = jnp.dot(gi, hj.T, preferred_element_type=jnp.float32)
        ds = a * (gh - ri)
        # contraction backward by hand: df into the embed vjp, dwh directly
        df = (ds[:, :, None] * whjf[None, :, :]).reshape(ti * tj, feat)
        dwhj_c = jnp.sum(ds[:, :, None] * f3, axis=0)        # [tj, feat]
        dxj_c, dw1_c, db1_c, dw2_c, db2_c, dw3_c, db3_c = vjp_fn(df)
        dhj_c = jnp.dot(a.T, gi, preferred_element_type=jnp.float32)
        return (dxj + dxj_c, dhj + dhj_c, dwhj + dwhj_c,
                dw1 + dw1_c, db1 + db1_c, dw2 + dw2_c, db2 + db2_c,
                dw3 + dw3_c, db3 + db3_c)

    zeros = (jnp.zeros((tj, 4), jnp.float32),
             jnp.zeros((tj, hdim), jnp.float32),
             jnp.zeros((tj, feat), jnp.float32),
             jnp.zeros(w1.shape, jnp.float32),
             jnp.zeros(b1.shape, jnp.float32),
             jnp.zeros(w2.shape, jnp.float32),
             jnp.zeros(b2.shape, jnp.float32),
             jnp.zeros(w3.shape, jnp.float32),
             jnp.zeros(b3.shape, jnp.float32))
    out = jax.lax.fori_loop(istart_ref[jt], iend_ref[jt] + 1, i_body, zeros)
    dxj, dhj, dwhj, dw1, db1, dw2, db2, dw3, db3 = out
    dxj_ref[:] = dxj
    dhj_ref[:] = dhj
    dwhj_ref[:] = dwhj

    @pl.when(jt == 0)
    def _init():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2
        dw3_ref[:] = dw3
        db3_ref[:] = db3

    @pl.when(jt > 0)
    def _acc():
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2
        dw3_ref[:] += dw3
        db3_ref[:] += db3


def _pallas_backward(params: Dict, x4_last, h, scene_ids, g, out_pad,
                     stats, *, tile_big: int = 128, tile_small: int = 32,
                     interpret: bool = False):
    """Assemble dL/d(params, x4, h) from the two backward kernels.

    Cotangent accumulation runs f32 in both precisions; under a bf16
    forward the score recompute uses bf16 operands (weights cast inside
    the kernels' vjp'd functions, h/wh tiles stored bf16 — halving their
    VMEM) so the rebuilt attention renormalizes exactly against the
    forward's saved (m, l).  ``out_pad``/``stats`` are the padded f32
    forward output and per-row softmax stats saved by ``_fwd``.
    """
    n, hdim = h.shape
    op_dt = jnp.bfloat16 if h.dtype == jnp.bfloat16 else jnp.float32
    feat = params["attn_w"]["w"].shape[1]
    f32 = jnp.float32
    pf32 = jax.tree_util.tree_map(lambda x: x.astype(f32), params)
    n_pad = (-n) % tile_big
    if n_pad:
        x4_p = jnp.concatenate(
            [x4_last.astype(f32), jnp.zeros((n_pad, 4), f32)])
        h_p = jnp.concatenate([h.astype(f32), jnp.zeros((n_pad, hdim), f32)])
        ids_p = jnp.concatenate(
            [scene_ids, jnp.full((n_pad,), -1, scene_ids.dtype)])
        g_p = jnp.concatenate([g.astype(f32), jnp.zeros((n_pad, hdim), f32)])
    else:
        x4_p, h_p, g_p = (x4_last.astype(f32), h.astype(f32), g.astype(f32))
        ids_p = scene_ids
    n_tot = n + n_pad

    ww, wb = pf32["attn_w"]["w"], pf32["attn_w"]["b"]
    # same construction as the forward's wh (f32 dot, then operand-dtype
    # cast) so the backward's score operands are value-identical to it
    wh = (jnp.dot(h_p, ww) + wb).astype(op_dt)       # [n_tot, F]
    h_k = h_p.astype(op_dt)                          # exact: h was op_dt
    w1, w2, w3 = pf32["feat_mlp"]
    ids2d = ids_p.astype(jnp.int32).reshape(n_tot, 1)
    r = jnp.sum(g_p * out_pad, axis=-1, keepdims=True)   # g·out per row

    sent = jnp.where(ids_p >= 0, ids_p.astype(jnp.int32),
                     jnp.iinfo(jnp.int32).max)
    # both kernels grid over tile_big tiles with tile_small tiles inside,
    # and tile overlap is symmetric — one band computation serves both
    jstart, jend = _tile_bands(sent, n_tot, tile_big, tile_small)
    istart, iend = jstart, jend

    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    shared_in_specs = [
        full((n_tot, 4)), full((n_tot, 1)), full((n_tot, hdim)),
        full((n_tot, feat)), full((n_tot, hdim)), full((n_tot, 2)),
        full((n_tot, 1)),
        full(w1["w"].shape), full(w1["b"].shape),
        full(w2["w"].shape), full(w2["b"].shape),
        full(w3["w"].shape), full(w3["b"].shape),
    ]
    shared_args = (x4_p, ids2d, h_k, wh, g_p, stats, r,
                   w1["w"], w1["b"], w2["w"], w2["b"], w3["w"], w3["b"])

    # ---- kernel A: dx_i (grid over big i-tiles, small j-tiles inside)
    dxi = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, ti=tile_big, tj=tile_small,
                          op_dt=op_dt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tot // tile_big,),
            in_specs=shared_in_specs,
            out_specs=pl.BlockSpec((tile_big, 4), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tot, 4), f32),
        interpret=interpret,
    )(jstart, jend, *shared_args)

    # ---- kernel B: dx_j, dh_j, d(Wh)_j + MLP weight grads
    # (grid over big j-tiles, small i-tiles inside — the transposed band)
    outs = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, ti=tile_small, tj=tile_big,
                          op_dt=op_dt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tot // tile_big,),
            in_specs=shared_in_specs,
            out_specs=[
                pl.BlockSpec((tile_big, 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_big, hdim), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_big, feat), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                full(w1["w"].shape), full(w1["b"].shape),
                full(w2["w"].shape), full(w2["b"].shape),
                full(w3["w"].shape), full(w3["b"].shape),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_tot, 4), f32),
            jax.ShapeDtypeStruct((n_tot, hdim), f32),
            jax.ShapeDtypeStruct((n_tot, feat), f32),
            jax.ShapeDtypeStruct(w1["w"].shape, f32),
            jax.ShapeDtypeStruct(w1["b"].shape, f32),
            jax.ShapeDtypeStruct(w2["w"].shape, f32),
            jax.ShapeDtypeStruct(w2["b"].shape, f32),
            jax.ShapeDtypeStruct(w3["w"].shape, f32),
            jax.ShapeDtypeStruct(w3["b"].shape, f32),
        ],
        interpret=interpret,
    )(istart, iend, *shared_args)
    dxj, dhj, dwh, dw1, db1, dw2, db2, dw3, db3 = outs

    # wh = h @ Ww + wb was computed OUTSIDE the forward kernel — pull the
    # dwh cotangent back through it here (cheap [N, F] XLA math)
    dww = jnp.dot(h_p.T, dwh)
    dwb = jnp.sum(dwh, axis=0)
    dh = (dhj + jnp.dot(dwh, ww.T))[:n]
    dx = (dxi + dxj)[:n]

    # cotangents must match the primal dtypes/containers
    mlp_c = type(params["feat_mlp"])
    lin = lambda t, dwv, dbv: {"w": dwv.astype(t["w"].dtype),
                               "b": dbv.astype(t["b"].dtype)}
    dparams = {
        "feat_mlp": mlp_c([lin(w1, dw1, db1), lin(w2, dw2, db2),
                           lin(w3, dw3, db3)]),
        "attn_w": {"w": dww.astype(params["attn_w"]["w"].dtype),
                   "b": dwb.astype(params["attn_w"]["b"].dtype)},
    }
    return dparams, dx.astype(x4_last.dtype), dh.astype(h.dtype)


def _xla_reference(params: Dict, x4_last, h, scene_ids):
    feats = social_xla.social_features(x4_last)
    f_emb = mlp_apply(params["feat_mlp"], feats)
    return social_xla.attention_pool(params["attn_w"], f_emb, h,
                                     social_xla.scene_mask(scene_ids))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def social_attention_fused(params: Dict, x4_last: jnp.ndarray,
                           h: jnp.ndarray, scene_ids: jnp.ndarray,
                           max_scene: int = 0) -> jnp.ndarray:
    """Fused features→embed→pool. Same math as ops.social (±1e-5).

    ``max_scene`` (static) only shapes the FALLBACK backward: when the
    Pallas backward is unavailable (n > the VMEM agent cap) and the caller
    can bound rows-per-scene, the vjp uses the linear windowed form
    instead of the O(N²) blockwise one (measured 3-8× faster)."""
    return _pallas_forward(params, x4_last, h, scene_ids,
                           interpret=_FWD_INTERPRET)


# Pallas backward keeps the full residents (x4, g f32; h, wh in the
# forward's operand dtype; stats) in VMEM — roughly 2× the forward's
# footprint, so a lower agent cap; above it the backward falls to the XLA
# blockwise remat form.  (bf16 halves the h/wh residents; the cap is kept
# shared and conservative.)
_PALLAS_BWD_MAX_AGENTS = 8192
_BWD_INTERPRET = False    # tests set True to run the Pallas backward on CPU
_FWD_INTERPRET = False    # tests set True to route the DISPATCH path (incl.
#                           under shard_map meshes) through the fused kernel
#                           in interpret mode on CPU


def _use_pallas_bwd(h) -> bool:
    """Static (trace-time) choice of the backward implementation.

    Both precisions: the backward recomputes scores with the forward's
    operand dtype (bf16 forward → bf16 recompute, f32 grad accumulation),
    so the rebuilt attention renormalizes exactly against the saved (m, l)
    stats in either mode.  Only the agent cap (VMEM residents) forces the
    blockwise-remat fallback."""
    return (h.shape[0] <= _PALLAS_BWD_MAX_AGENTS
            and (jax.default_backend() == "tpu" or _BWD_INTERPRET))


def _fwd(params, x4_last, h, scene_ids, max_scene=0):
    if _use_pallas_bwd(h):
        out_pad, stats = _pallas_forward(params, x4_last, h, scene_ids,
                                         with_stats=True,
                                         interpret=_FWD_INTERPRET)
        out = out_pad[:h.shape[0]].astype(h.dtype)
        return out, (params, x4_last, h, scene_ids, out_pad, stats)
    # light residuals — the blockwise backward never reads out/stats, so
    # don't hold ~n·(H+2) f32 alive across the forward-to-backward span
    out = _pallas_forward(params, x4_last, h, scene_ids,
                          interpret=_FWD_INTERPRET)
    return out, (params, x4_last, h, scene_ids, None, None)


def _bwd(max_scene, res, g):
    params, x4_last, h, scene_ids, out_pad, stats = res
    if out_pad is not None:
        # fused flash-style backward: recomputes pair scores per tile from
        # the saved softmax stats; exact gradients, O(tile) memory
        dp, dx, dh = _pallas_backward(params, x4_last, h, scene_ids,
                                      g, out_pad, stats,
                                      interpret=_BWD_INTERPRET)
        return dp, dx, dh, None
    # rematerialized XLA backward; windowed O(N·max_scene) when the caller
    # bounds rows-per-scene (3-8× faster than blockwise, BASELINE.md),
    # else blockwise O(N²) with O(N·block) memory (the dense reference's
    # backward needs the full N²·F pairwise tensors — ~26 GB at N=10k)
    if max_scene > 0:
        def f(p, x, hh):
            return social_xla.social_context_windowed(
                p, x, hh, scene_ids, max_scene=max_scene)
    else:
        def f(p, x, hh):
            return social_xla.social_context_blockwise(
                p, x, hh, scene_ids, block=256)
    _, vjp = jax.vjp(f, params, x4_last, h)
    dp, dx, dh = vjp(g)
    return dp, dx, dh, None


social_attention_fused.defvjp(_fwd, _bwd)


def social_attention_chunked(params: Dict, x4_last: jnp.ndarray,
                             h: jnp.ndarray, scene_ids: jnp.ndarray,
                             max_scene: int, chunk: int = 0) -> jnp.ndarray:
    """Fused Pallas attention beyond the VMEM agent caps: linear in N.

    The fused kernel (and especially its backward pair) keeps all N agents
    VMEM-resident, capping it at 8-32k agents.  This wrapper restores the
    kernel at crowd scale: scene ids are sorted and contiguous with scenes
    of ≤ ``max_scene`` rows (the same caller contract as the windowed XLA
    form), so a row's whole scene lies within ``max_scene - 1`` rows of it.
    ``lax.map`` over row chunks then calls the fused kernel on
    [chunk + 2·halo]-row slices and keeps each slice's middle ``chunk``
    rows — every (i, j) pair is computed exactly once as a kept query, so
    outputs AND gradients (via each slice's custom vjp + the slice
    scatter-add transpose) match the unchunked kernel exactly.

    Slice layout keeps the kernel's sorted-ids REQUIREMENT: real ids shift
    +1 so the front halo can use id 0 — valid-looking (≥ 0, so the band
    sentinel keeps monotone order) but matching no real scene; tail padding
    stays −1.  Halo rows' outputs are dropped (zero cotangent), so they
    contribute no spurious gradient.

    Default ``chunk`` fills the backward cap: 8192 − 2·max_scene rows per
    kernel call (halo overhead 2·max_scene/chunk ≈ 1.6% at max_scene=64).
    """
    n, hdim = h.shape
    halo = int(max_scene)
    if chunk <= 0:
        chunk = _PALLAS_BWD_MAX_AGENTS - 2 * halo
    assert chunk > 0, "max_scene too large for the Pallas VMEM caps"
    n_chunks = -(-n // chunk)
    pad_tail = n_chunks * chunk - n + halo

    ids_shift = jnp.where(scene_ids >= 0,
                          scene_ids.astype(jnp.int32) + 1, -1)
    x4_p = jnp.concatenate([jnp.zeros((halo, 4), x4_last.dtype), x4_last,
                            jnp.zeros((pad_tail, 4), x4_last.dtype)])
    h_p = jnp.concatenate([jnp.zeros((halo, hdim), h.dtype), h,
                           jnp.zeros((pad_tail, hdim), h.dtype)])
    ids_p = jnp.concatenate([jnp.zeros((halo,), jnp.int32), ids_shift,
                             jnp.full((pad_tail,), -1, jnp.int32)])

    m = chunk + 2 * halo

    def one_chunk(c):
        s = c * chunk
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s, m)
        out = social_attention_fused(params, sl(x4_p), sl(h_p), sl(ids_p),
                                     max_scene)
        return out[halo:halo + chunk]

    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return out.reshape(n_chunks * chunk, hdim)[:n]


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
    - chunked Pallas (O(N·max_scene) work — LINEAR in N, fused fwd+bwd
      kernels per row chunk): requested + TPU + beyond the VMEM cap, when
      the caller bounds rows-per-scene (``max_scene > 0``) — the Pallas
      path to million-agent crowd TRAINING;
    - windowed XLA (O(N·max_scene) work — LINEAR in N): larger inputs
      when the caller can bound rows-per-scene (``max_scene > 0``; ids
      sorted + contiguous) — the non-Pallas crowd path;
    - blockwise streamed XLA (O(N²) work, O(N·block) memory): larger
      inputs with unbounded scenes;
    - dense XLA reference: small inputs (fewer, fatter ops win there).
    """
    n = h.shape[0]
    cap = (_PALLAS_MAX_AGENTS_BF16 if h.dtype == jnp.bfloat16
           else _PALLAS_MAX_AGENTS)
    on_pallas_backend = (jax.default_backend() == "tpu" or _FWD_INTERPRET)
    if use_pallas and n <= cap and on_pallas_backend:
        return social_attention_fused(params, x4_last, h, scene_ids,
                                      max_scene)
    if (use_pallas and n > cap and max_scene > 0 and on_pallas_backend
            and 2 * max_scene < _PALLAS_BWD_MAX_AGENTS):
        return social_attention_chunked(params, x4_last, h, scene_ids,
                                        max_scene)
    if n > _DENSE_MAX_AGENTS:
        if max_scene > 0:
            return social_xla.social_context_windowed(
                params, x4_last, h, scene_ids, max_scene=max_scene)
        return social_xla.social_context_blockwise(params, x4_last, h,
                                                   scene_ids, block=256)
    return _xla_reference(params, x4_last, h, scene_ids)
