"""Fused autoregressive-decode Pallas kernel.

The generator's hot loop (reference train.py:418-430; ours
models/generator.decode_rollout) runs n_next=12 sequential tiny steps:
decoder MLP → Euler integrate → embed → encoder LSTM cell.  Under XLA each
step is ~8 small kernels with HBM round-trips for every intermediate; this
kernel runs ALL steps for a tile of agents in one launch, keeping the LSTM
state, social context, noise, and every intermediate in VMEM.  Weights
(≈250 KB at h=64) are VMEM-resident for the whole rollout.

Concatenations are algebraic: ``[h‖s‖z] @ W ≡ h@W_h + s@W_s + z@W_z`` —
each a clean MXU matmul on pre-split weight slices, no data movement.

Forward-only path, OFF by default (config.pallas_decode).  Honest on-device
numbers (v5e, 100-call device-side scan, h=64, n_next=12): XLA decode is
FASTER at every measured size — 301 vs 328 µs at n=1024, 371 vs 524 at
4096, 561 vs 891 at 10240.  The earlier "1.65× vs XLA" result was a
host-dispatch artifact: per-call XLA decode launches ~8 kernels/step and
the Pallas form 1, which matters over a remote tunnel but not inside a
fused device program (where this always runs in practice).  The kernel is
kept as the starting point for a fused K-sample decode (where weight reuse
across K could win) and for kernel-development reference.  The
``jax.custom_vjp`` wrapper falls back to the XLA implementation's VJP, so
it is safe under ``grad``.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h_ref, c_ref, s_ref, z_ref, p_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
            we_ref, be_ref, wl_ref, bl_ref,
            out_ref, *, n_next: int, hid: int, zdim: int):
    """One grid step handles a [TI] tile of agents for all n_next steps.

    Decoder weight slices: w1 [h+f+z, d] is pre-split by the wrapper into a
    single array; the concat trick indexes row ranges.
    """
    h = h_ref[:]                       # [ti, hid]
    c = c_ref[:]
    s = s_ref[:]
    z = z_ref[:]
    last_p = p_ref[:]                  # [ti, 2]

    f32 = jnp.float32

    def leaky(x):
        return jnp.where(x > 0, x, 0.2 * x)

    def step(carry):
        h, c, last_p = carry
        # decoder layer 1: [h‖s‖z] @ w1  (row-sliced matmuls)
        x = (jnp.dot(h, w1_ref[0:hid, :], preferred_element_type=f32)
             + jnp.dot(s, w1_ref[hid:2 * hid, :], preferred_element_type=f32)
             + jnp.dot(z, w1_ref[2 * hid:2 * hid + zdim, :],
                       preferred_element_type=f32) + b1_ref[:])
        x = leaky(x)
        x = leaky(jnp.dot(x, w2_ref[:], preferred_element_type=f32)
                  + b2_ref[:])
        x = jnp.dot(x, w3_ref[:], preferred_element_type=f32) + b3_ref[:]
        new_v = jnp.dot(x, w4_ref[:], preferred_element_type=f32) + b4_ref[:]
        new_p = new_v + last_p                              # [ti, 2]

        # embed the 4-D step: [p‖v] @ we  (we: [4, hid])
        emb = (jnp.dot(new_p, we_ref[0:2, :], preferred_element_type=f32)
               + jnp.dot(new_v, we_ref[2:4, :], preferred_element_type=f32)
               + be_ref[:])

        # encoder LSTM cell: gates = [emb‖h] @ wl + bl  (wl: [2h, 4h])
        gates = (jnp.dot(emb, wl_ref[0:hid, :], preferred_element_type=f32)
                 + jnp.dot(h, wl_ref[hid:2 * hid, :],
                           preferred_element_type=f32) + bl_ref[:])
        i = jax.nn.sigmoid(gates[:, 0:hid])
        f = jax.nn.sigmoid(gates[:, hid:2 * hid])
        g = jnp.tanh(gates[:, 2 * hid:3 * hid])
        o = jax.nn.sigmoid(gates[:, 3 * hid:4 * hid])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new, new_p), jnp.concatenate([new_p, new_v], -1)

    # fori_loop keeps the Mosaic program small (a 12× Python unroll took
    # ~10 min to compile).  The per-step [ti, 4] slab is stored directly at
    # a dynamic offset on the output's MAJOR axis (out_ref: [n_next, ti, 4])
    # — dynamic offsets are only forbidden on the tiled (sublane, lane)
    # dims, so this is a plain strided store, unlike a dynamic COLUMN
    # offset into a [ti, n_next·4] layout (unsupported) or the one-hot
    # mask-scatter it replaces (which re-wrote all n_next slots per step).
    def body(t, carry):
        carry, step4 = step(carry)
        out_ref[pl.ds(t, 1), :, :] = step4[None]
        return carry

    jax.lax.fori_loop(0, n_next, body, (h, c, last_p))


def _pallas_decode(params: Dict, prep, noise: jnp.ndarray, n_next: int,
                   *, ti: int = 256, interpret: bool = False) -> jnp.ndarray:
    h, c, s, last_p = prep
    n, hid = h.shape
    zdim = noise.shape[-1]
    dec = params["decoder"]

    n_pad = (-n) % ti
    if n_pad:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)])
        h, c, s, last_p, noise = map(pad, (h, c, s, last_p, noise))
    n_tot = n + n_pad

    full = lambda r, cdim: pl.BlockSpec((r, cdim), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    vec = lambda d: pl.BlockSpec((d,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    tile = lambda cdim: pl.BlockSpec((ti, cdim), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, n_next=n_next, hid=hid, zdim=zdim)
    d_in = dec[0]["w"].shape[0]
    out = pl.pallas_call(
        kern,
        grid=(n_tot // ti,),
        in_specs=[
            tile(hid), tile(hid), tile(hid), tile(zdim), tile(2),
            full(d_in, dec[0]["w"].shape[1]), vec(dec[0]["b"].shape[0]),
            full(*dec[1]["w"].shape), vec(dec[1]["b"].shape[0]),
            full(*dec[2]["w"].shape), vec(dec[2]["b"].shape[0]),
            full(*dec[3]["w"].shape), vec(dec[3]["b"].shape[0]),
            full(*params["embed"]["w"].shape),
            vec(params["embed"]["b"].shape[0]),
            full(*params["encoder"]["w"].shape),
            vec(params["encoder"]["b"].shape[0]),
        ],
        out_specs=pl.BlockSpec((n_next, ti, 4), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_next, n_tot, 4), jnp.float32),
        interpret=interpret,
    )(h, c, s, noise, last_p,
      dec[0]["w"], dec[0]["b"], dec[1]["w"], dec[1]["b"],
      dec[2]["w"], dec[2]["b"], dec[3]["w"], dec[3]["b"],
      params["embed"]["w"], params["embed"]["b"],
      params["encoder"]["w"], params["encoder"]["b"])
    return jnp.moveaxis(out, 0, 1)[:n]      # [n_next, N, 4] → [N, n_next, 4]


def _xla_decode(params, prep, noise, n_next):
    from socialways_tpu.models.generator import decode_rollout
    return decode_rollout(params, prep, noise, n_next, decoder="fc")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def decode_rollout_fused(params: Dict, prep, noise: jnp.ndarray,
                         n_next: int) -> jnp.ndarray:
    return _pallas_decode(params, prep, noise, n_next)


def _fwd(params, prep, noise, n_next):
    return _pallas_decode(params, prep, noise, n_next), (params, prep, noise)


def _bwd(n_next, res, g):
    params, prep, noise = res
    _, vjp = jax.vjp(lambda p, pr, z: _xla_decode(p, pr, z, n_next),
                     params, prep, noise)
    return vjp(g)


decode_rollout_fused.defvjp(_fwd, _bwd)
