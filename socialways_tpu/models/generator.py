"""Generator: LSTM path encoder + social attention + autoregressive decoder.

Architecture parity with the reference generator (train.py:245-269, 320-366,
392-432), re-designed as one pure function:

- the 12-step autoregressive rollout is a single ``lax.scan`` whose carry is
  (lstm h, lstm c, last position) — the reference instead mutates the
  encoder's hidden state through 12 eager ``encoder()`` calls;
- social features are computed once from the last observed frame and never
  refreshed during decode (train.py:409-413 — a deliberate reference
  behavior we replicate);
- decode feeds each prediction back through the SAME encoder LSTM
  (train.py:430), so the encoder params serve both sequence encoding and
  step updates.

Decoder dims replicate DecoderFC (train.py:320-335): with input dim
d = hidden + social + noise, the stack is Linear(d,d)+LReLU,
Linear(d,d/2)+LReLU, Linear(d/2,d/4), Linear(d/4,2) — note NO activation
after the third layer.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from socialways_tpu.config import TrainConfig
from socialways_tpu.ops.lstm import lstm_cell, lstm_init, lstm_seq, zero_state
from socialways_tpu.ops.nn import (
    leaky_relu,
    linear_apply,
    linear_init,
    mlp_init,
)
from socialways_tpu.ops.traj import obsv_to_4d


def init_generator(key: jax.Array, cfg: TrainConfig, dtype=jnp.float32) -> Dict:
    """Build the generator param pytree: embed, encoder LSTM, social feature
    MLP, attention projection, decoder."""
    h = cfg.hidden_size
    f = cfg.social_feature_size
    d = cfg.decoder_input
    keys = jax.random.split(key, 6)
    params = {
        "embed": linear_init(keys[0], 4, h, dtype),
        "encoder": lstm_init(keys[1], h, h, dtype),
        # social feature embedding MLP 3→32→64→f with ReLU (train.py:183-185)
        "feat_mlp": mlp_init(keys[2], [cfg.num_social_features, 32, 64, f],
                             dtype),
        "attn_w": linear_init(keys[3], h, f, dtype),
    }
    if cfg.decoder == "lstm":
        # DecoderLstm (train.py:339-366): LSTM(d→h) + FC h→64(Sigmoid)
        # →64(LReLU)→32(LReLU)→2
        params["dec_lstm"] = lstm_init(keys[4], d, h, dtype)
        params["dec_fc"] = mlp_init(keys[5], [h, 64, 64, 32, 2], dtype)
    else:
        params["decoder"] = mlp_init(keys[4], [d, d, d // 2, d // 4, 2],
                                     dtype)
    return params


def _decoder_fc_apply(layers: list, x: jnp.ndarray) -> jnp.ndarray:
    """DecoderFC: LReLU(0.2) after the first two layers only."""
    x = leaky_relu(linear_apply(layers[0], x))
    x = leaky_relu(linear_apply(layers[1], x))
    x = linear_apply(layers[2], x)
    x = linear_apply(layers[3], x)
    return x


def _decoder_lstm_fc_apply(layers: list, x: jnp.ndarray) -> jnp.ndarray:
    """DecoderLstm head: Sigmoid, LReLU, LReLU between layers."""
    x = jax.nn.sigmoid(linear_apply(layers[0], x))
    x = leaky_relu(linear_apply(layers[1], x))
    x = leaky_relu(linear_apply(layers[2], x))
    return linear_apply(layers[3], x)


def encode_observation(params: Dict, obsv_4d: jnp.ndarray,
                       remat: bool = False):
    """Run the encoder LSTM over the observed 4-D sequence.

    obsv_4d: [N, T, 4] → (h, c) each [N, hidden]."""
    n = obsv_4d.shape[0]
    hidden = params["embed"]["w"].shape[1]
    emb = linear_apply(params["embed"], obsv_4d)
    _, state = lstm_seq(params["encoder"], emb,
                        zero_state(n, hidden, obsv_4d.dtype), remat)
    return state


def social_context(params: Dict, obsv_4d: jnp.ndarray, h: jnp.ndarray,
                   scene_ids: jnp.ndarray,
                   use_pallas: bool = False,
                   max_scene: int = 0,
                   x4_last: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Attention-pooled social context from the last observed frame.

    Routed through the size-aware dispatch in kernels.social_attention:
    fused Pallas kernel (requested + TPU + fits VMEM), blockwise streamed
    form above the dense-memory cliff, dense XLA for small inputs.

    ``x4_last`` overrides the geometry source (default: the last frame of
    ``obsv_4d``) — under cfg.agent_frame the pairwise features must come
    from WORLD-frame states while ``h`` stays canonical (see
    prepare_rollout)."""
    from socialways_tpu.kernels.social_attention import social_attention
    return social_attention(
        {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]},
        obsv_4d[:, -1] if x4_last is None else x4_last, h, scene_ids,
        use_pallas=use_pallas, max_scene=max_scene)


def prepare_rollout(
    params: Dict,
    obsv_p: jnp.ndarray,            # [N, n_past, 2] normalized positions
    scene_ids: Optional[jnp.ndarray] = None,
    use_social: bool = False,
    use_pallas: bool = False,
    max_scene: int = 0,
    remat: bool = False,
    social_states: Optional[jnp.ndarray] = None,
):
    """Noise-independent half of the rollout: encode the observation and
    pool the social context.  K-sample evaluation computes this ONCE and
    vmaps only :func:`decode_rollout` over the K noise draws — the reference
    re-ran the whole encoder K times (train.py:583-585).

    ``social_states`` ([N, 4], optional) overrides the last-observed-frame
    states the pairwise social geometry is computed from.  This is how
    cfg.agent_frame composes with use_social: ``obsv_p`` arrives in
    per-agent canonical frames (so ``h`` is a heading-invariant motion
    descriptor) while ``social_states`` carries the WORLD-frame last-obs
    states — the pairwise features (distance, bearing, DCA;
    train.py:192-241) are relational quantities between agents and only
    make sense in one shared frame.  The pooled context Σ attn_ij·h_j then
    mixes world-frame attention scores with canonical h_j, which is
    invariant under global isometries of the scene — the full composed
    model stays rotation-equivariant (tests/test_agent_frame.py)."""
    n = obsv_p.shape[0]
    obsv_4d = obsv_to_4d(obsv_p)
    h, c = encode_observation(params, obsv_4d, remat)
    if use_social:
        if scene_ids is None:
            scene_ids = jnp.zeros((n,), jnp.int32)
        s = social_context(params, obsv_4d, h, scene_ids, use_pallas,
                           max_scene, x4_last=social_states)
    else:
        s = jnp.zeros_like(h)
    return h, c, s, obsv_p[:, -1]


def decode_rollout(
    params: Dict,
    prep,                            # (h, c, s, last_p) from prepare_rollout
    noise: jnp.ndarray,              # [N, noise_len]
    n_next: int,
    decoder: str = "fc",
    remat: bool = False,
) -> jnp.ndarray:
    """Noise-dependent autoregressive decode. Returns pred_4d [N, n_next, 4].

    Mirrors reference ``predict`` (train.py:392-432) with the 12-step loop
    as ``lax.scan``; carry = (h, c, last position).  (A fully-fused Pallas
    decode kernel existed through round 2 but lost to XLA's own decode in
    every regime including inside the fused crowd-simulate program —
    benchmarks/decode_kernel_ab.json — and was removed; see git history
    for the kernel and its writeup.)

    ``remat`` checkpoints each decode step (and keeps the scan rolled): the
    training residuals drop from ~24 KB/agent (every FC/LSTM intermediate
    of 12 unrolled steps) to the per-step carries — the lever that lifts
    the one-chip crowd-TRAINING ceiling past 262k agents.  Value-identical;
    backward recomputes each step once.
    """
    h, c, s, last_p0 = prep
    n = h.shape[0]
    dec_state = (zero_state(n, params["dec_lstm"]["w"].shape[1] // 4,
                            h.dtype)
                 if decoder == "lstm" else None)

    def step(carry, _):
        if decoder == "lstm":
            h, c, last_p, (dh, dc) = carry
        else:
            h, c, last_p = carry
        inp = jnp.concatenate([h, s, noise], axis=-1)
        if decoder == "lstm":
            dh, dc = lstm_cell(params["dec_lstm"], inp, (dh, dc))
            new_v = _decoder_lstm_fc_apply(params["dec_fc"], dh)
        else:
            new_v = _decoder_fc_apply(params["decoder"], inp)
        new_p = new_v + last_p
        step_4d = jnp.concatenate([new_p, new_v], axis=-1)
        # feed the prediction back through the encoder LSTM (train.py:430)
        h2, c2 = lstm_cell(params["encoder"],
                           linear_apply(params["embed"], step_4d), (h, c))
        if decoder == "lstm":
            return (h2, c2, new_p, (dh, dc)), step_4d
        return (h2, c2, new_p), step_4d

    init = ((h, c, last_p0, dec_state) if decoder == "lstm"
            else (h, c, last_p0))
    # n_next is small (12) — full unroll removes scan overhead (see
    # ops/lstm.lstm_seq); under remat keep the scan rolled so residuals
    # stay O(carry)
    step_fn = jax.checkpoint(step) if remat else step
    _, pred_4d = jax.lax.scan(step_fn, init, None, length=n_next,
                              unroll=not remat)
    return jnp.moveaxis(pred_4d, 0, 1)      # [n_next, N, 4] → [N, n_next, 4]


def generator_rollout(
    params: Dict,
    obsv_p: jnp.ndarray,
    noise: jnp.ndarray,
    n_next: int,
    scene_ids: Optional[jnp.ndarray] = None,
    use_social: bool = False,
    decoder: str = "fc",
    use_pallas: bool = False,
    max_scene: int = 0,
    remat_steps: bool = False,
    social_states: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full prediction rollout (prepare + decode). [N, n_next, 4].

    ``use_pallas`` gates the fused social-attention kernel (an on-device
    win); ``remat_steps`` checkpoints the encoder/decode steps
    (crowd-scale training memory); ``social_states`` supplies world-frame
    last-obs states for the social geometry when ``obsv_p`` is
    canonicalized (see prepare_rollout)."""
    prep = prepare_rollout(params, obsv_p, scene_ids, use_social,
                           use_pallas, max_scene, remat_steps,
                           social_states)
    return decode_rollout(params, prep, noise, n_next, decoder,
                          remat_steps)
