"""Agents-axis sharded social attention (the crowd analogue of sequence
parallelism, SURVEY §5.7).

Data parallelism keeps whole scenes on one device; when a single scene's
agent count exceeds a chip (the 10k-agent regime), the quadratic
agents×neighbors attention itself must shard.  Strategy here: shard the
agents axis over the mesh; each device gathers the (tiny) per-agent keys —
last-frame state, hidden state, scene id — with one ``all_gather`` over ICI
and computes only its local rows of the N_local × N_global attention.
Per-agent payload is 4+H+1 floats (~276 B at H=64), so even 100k agents
gather ~28 MB — the N² pair computation, which is what actually explodes,
never crosses devices.

:func:`ring_social_context` is the ring-scheduled refinement for when the
gathered keys no longer fit (or to overlap compute with communication): the
neighbor key block circulates the mesh ring via ``ppermute`` — the
agents-axis analogue of ring attention — with a streaming (flash-style)
softmax, so each device only ever holds ONE remote block.  Peak memory per
device drops from O(N_global·(4+H)) gathered keys + O(N_local·N_global)
scores to O(N_local·(4+H)) + O(N_local²) regardless of mesh size.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from socialways_tpu.ops.nn import linear_apply, mlp_apply
from socialways_tpu.ops.social import safe_norm

_NEG = -1e9


def sharded_social_context(
    params: Dict,
    x4_last: jnp.ndarray,     # [N_local, 4] this shard's last-frame states
    h: jnp.ndarray,           # [N_local, H]
    scene_ids: jnp.ndarray,   # [N_local]
    axis_name: str,
) -> jnp.ndarray:
    """Social context for the local agents against ALL agents on the mesh
    axis.  Call inside shard_map with the agents axis sharded.

    Math identical to ops.social.social_features + attention_pool with the
    j (neighbor) axis global.
    """
    # gather neighbor keys: [D, N_local, ...] → [N_global, ...]
    x4_all = jax.lax.all_gather(x4_last, axis_name, tiled=True)
    h_all = jax.lax.all_gather(h, axis_name, tiled=True)
    ids_all = jax.lax.all_gather(scene_ids, axis_name, tiled=True)

    # self-exclusion by GLOBAL index; geometry/score math shared with the
    # ring form (_block_scores — ONE copy of the epsilon-sensitive
    # reference-parity math, the gathered axis as a single block)
    n_local = x4_last.shape[0]
    row_g = (jax.lax.axis_index(axis_name) * n_local
             + jnp.arange(n_local))[:, None]
    col_g = jnp.arange(x4_all.shape[0])[None, :]
    scores, mask = _block_scores(params, x4_last, h, scene_ids,
                                 x4_all, h_all, ids_all, row_g, col_g)

    smax = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.where(mask, jnp.exp(scores - smax), 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    attn = unnorm / jnp.maximum(denom, 1e-20)
    pooled = jnp.einsum("ij,jf->if", attn, h_all)
    has_nb = jnp.any(mask, axis=-1, keepdims=True)
    return jnp.where(has_nb, pooled, 0.0)


def _block_scores(params, x4_last, h_q, scene_ids, x4_j, h_j, ids_j,
                  row_g, col_g):
    """Masked attention scores of local queries against ONE neighbor block.

    Math identical to ops.social.social_features + the score side of
    attention_pool (same 1e-6 epsilons, reference train.py:208-226);
    returns (scores [N_local, N_block] with −1e9 at masked pairs, mask)."""
    p_i, v_i = x4_last[:, :2], x4_last[:, 2:]
    p_j, v_j = x4_j[:, :2], x4_j[:, 2:]
    dp = p_i[:, None, :] - p_j[None, :, :]
    dv = v_i[:, None, :] - v_j[None, :, :]

    dist = safe_norm(dp)
    dot_dp_v = jnp.einsum("ijk,ik->ij", dp, v_i)
    bearing = dot_dp_v / (dist * safe_norm(v_i)[:, None] + 1e-6)
    dot_dp_dv = jnp.sum(dp * dv, axis=-1)
    ttca = -dot_dp_dv / (jnp.sum(dv * dv, axis=-1) + 1e-6)
    dca = safe_norm(dp + ttca[..., None] * dv)

    feats = jnp.stack([dist, bearing, dca], axis=-1)
    f_emb = mlp_apply(params["feat_mlp"], feats)      # [N_local, N_blk, F]
    wh_j = linear_apply(params["attn_w"], h_j)        # [N_blk, F]
    scores = jnp.einsum("ijf,jf->ij", f_emb, wh_j)

    same = scene_ids[:, None] == ids_j[None, :]
    valid = (scene_ids[:, None] >= 0) & (ids_j[None, :] >= 0)
    mask = same & valid & (row_g != col_g)
    return jnp.where(mask, scores, _NEG), mask


def ring_social_context(
    params: Dict,
    x4_last: jnp.ndarray,     # [N_local, 4]
    h: jnp.ndarray,           # [N_local, H]
    scene_ids: jnp.ndarray,   # [N_local]
    axis_name: str,
) -> jnp.ndarray:
    """Ring-scheduled social context (agents-axis ring attention).

    The neighbor key block (x4, h, ids — ~(5+H) floats/agent) circulates
    the mesh ring: at hop r each device scores its local queries against
    the block that originated on device (my_index − r) mod D, folds it into
    a streaming masked softmax, and ``ppermute``s the block to the next
    ring neighbor over ICI.  Equals :func:`sharded_social_context` (and the
    single-device ops.social math) up to float reassociation of the
    softmax accumulation.

    Call inside shard_map with the agents axis sharded.
    """
    d = jax.lax.axis_size(axis_name)
    n_local = x4_last.shape[0]
    my = jax.lax.axis_index(axis_name)
    row_g = (my * n_local + jnp.arange(n_local))[:, None]
    perm = [(i, (i + 1) % d) for i in range(d)]
    hdim = h.shape[-1]

    m = jnp.full((n_local, 1), _NEG, x4_last.dtype)
    l = jnp.zeros((n_local, 1), x4_last.dtype)
    acc = jnp.zeros((n_local, hdim), h.dtype)
    x4_j, h_j, ids_j = x4_last, h, scene_ids

    for r in range(d):                 # static mesh size — unrolled ring
        # double-buffered: issue hop r+1's ppermute BEFORE hop r's compute
        # so the ICI transfer rides under the O(N_local²) score work (XLA's
        # latency-hiding scheduler overlaps collective-permute with compute
        # it has no data dependence on).  Each hop then costs
        # max(compute, comm) instead of compute + comm.
        if r < d - 1:
            nxt = (jax.lax.ppermute(x4_j, axis_name, perm),
                   jax.lax.ppermute(h_j, axis_name, perm),
                   jax.lax.ppermute(ids_j, axis_name, perm))
        src = (my - r) % d             # block's origin device
        col_g = (src * n_local + jnp.arange(n_local))[None, :]
        scores, mask = _block_scores(params, x4_last, h, scene_ids,
                                     x4_j, h_j, ids_j, row_g, col_g)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.where(mask, jnp.exp(scores - m_new), 0.0)
        acc = acc * corr + p @ h_j
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        m = m_new
        if r < d - 1:
            x4_j, h_j, ids_j = nxt
    return jnp.where(l > 0, acc / jnp.maximum(l, 1e-20), 0.0)


def make_sharded_social_context(params: Dict, mesh, axis_name: str = "data"):
    """shard_map wrapper: inputs sharded on the agents (leading) axis."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(x4, h, ids):
        return sharded_social_context(params, x4, h, ids, axis_name)

    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False))
