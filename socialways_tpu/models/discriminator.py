"""Discriminator with InfoGAN Q-head.

Architecture parity with the reference ``Discriminator`` (train.py:272-316):

- observation branch: LSTM(4→h) over the observed 4-D sequence, last output
  through FC h→h/2 (LReLU 0.2) → h/2;
- prediction branch: the whole predicted 4-D trajectory flattened (n_next·4)
  through FC →h/2 (LReLU 0.2) → h/2;
- concat → classifier FC h→h/2 (LReLU) →1 (NO sigmoid — LSGAN losses) and a
  latent decoder (Q-head) FC h→h/2 (LReLU) →n_latent_codes.

The reference's ``load(backup)`` (train.py:311-316) restored only nn.Linear
weights after GAN unrolling, leaking LSTM weights; here restoration is a
pytree swap in the engine, with both behaviors available (config.d_restore).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from socialways_tpu.config import TrainConfig
from socialways_tpu.ops.lstm import lstm_init, lstm_seq, zero_state
from socialways_tpu.ops.nn import leaky_relu, linear_apply, mlp_init


def init_discriminator(key: jax.Array, cfg: TrainConfig,
                       dtype=jnp.float32) -> Dict:
    h = cfg.hidden_size
    keys = jax.random.split(key, 5)
    # PacGAN (cfg.pac > 1): the classifier scores packs of `pac` samples —
    # its input is the pack's concatenated obsv+pred codes.
    # Minibatch-stddev (cfg.mb_std): +1 scalar per sample before packing.
    cls_in = (h + (1 if cfg.mb_std else 0)) * cfg.pac
    return {
        "obsv_lstm": lstm_init(keys[0], 4, h, dtype),
        "obsv_fc": mlp_init(keys[1], [h, h // 2, h // 2], dtype),
        "pred_fc": mlp_init(keys[2], [cfg.n_next * 4, h // 2, h // 2], dtype),
        "classifier": mlp_init(keys[3], [cls_in, h // 2, 1], dtype),
        "latent_dec": mlp_init(keys[4], [h, h // 2, cfg.n_latent_codes],
                               dtype),
    }


def _fc2(layers: list, x: jnp.ndarray) -> jnp.ndarray:
    """Two linears with LeakyReLU(0.2) between (the reference's FC blocks)."""
    return linear_apply(layers[1], leaky_relu(linear_apply(layers[0], x)))


def encode_obsv(params: Dict, obsv_4d: jnp.ndarray,
                remat: bool = False) -> jnp.ndarray:
    """Observation branch: LSTM over the observed sequence → FC code.
    Depends only on the observation — one GAN step evaluates D on the same
    observation against fake AND real futures (×(unroll+1) updates), so
    callers compute this once per update and reuse it."""
    n = obsv_4d.shape[0]
    hidden = params["obsv_lstm"]["w"].shape[1] // 4
    ys, _ = lstm_seq(params["obsv_lstm"], obsv_4d,
                     zero_state(n, hidden, obsv_4d.dtype), remat)
    return _fc2(params["obsv_fc"], ys[:, -1])


def discriminator_heads(params: Dict, obsv_code: jnp.ndarray,
                        pred_4d: jnp.ndarray, pac: int = 1,
                        extra_feat: jnp.ndarray | None = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prediction branch + classifier + Q-head, given a (possibly shared)
    observation code.  pred_4d may batch multiple futures per observation:
    [K*N, n_next, 4] with obsv_code [N, ...] is tiled to match.

    With ``pac > 1`` (PacGAN) the classifier scores packs of ``pac``
    consecutive samples — label is [M/pac, 1]; the Q-head stays
    per-sample ([M, n_latent_codes]).

    ``extra_feat`` [M, E] (cfg.mb_std: the minibatch-stddev scalar, E=1) is
    appended to the classifier input only — the Q-head reconstructs the
    latent code from the per-sample features and must not see batch
    statistics."""
    m = pred_4d.shape[0]
    if obsv_code.shape[0] != m:
        reps = m // obsv_code.shape[0]
        obsv_code = jnp.concatenate([obsv_code] * reps, axis=0)
    pred_code = _fc2(params["pred_fc"], pred_4d.reshape(m, -1))
    both = jnp.concatenate([obsv_code, pred_code], axis=-1)
    cls_in = both if extra_feat is None else jnp.concatenate(
        [both, extra_feat.astype(both.dtype)], axis=-1)
    label = _fc2(params["classifier"],
                 cls_in.reshape(m // pac, -1) if pac > 1 else cls_in)
    code_hat = _fc2(params["latent_dec"], both)
    return label, code_hat


def discriminator_apply(params: Dict, obsv_4d: jnp.ndarray,
                        pred_4d: jnp.ndarray,
                        remat: bool = False, pac: int = 1,
                        extra_feat: jnp.ndarray | None = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """obsv_4d [N, n_past, 4], pred_4d [N, n_next, 4] →
    (label [N/pac, 1], code_hat [N, n_latent_codes])."""
    return discriminator_heads(params, encode_obsv(params, obsv_4d, remat),
                               pred_4d, pac, extra_feat)


def mb_std_feature(pred_4d: jnp.ndarray, valid: jnp.ndarray,
                   axis_name=None) -> jnp.ndarray:
    """Minibatch standard deviation (ProGAN's mode-collapse detector,
    Karras et al. 2018 §3, simplest single-group form) over one BLOCK of
    futures sharing provenance (all-fake or all-real — mixing the two would
    give both halves the same scalar and zero discriminative power).

    Masked: padding rows (valid=False) are excluded from the statistic.
    Under data parallelism pass ``axis_name``: the moment sums are
    ``psum``-ed so every shard sees the GLOBAL statistic and the DP step
    stays exactly equal to the single-device big batch.  Returns [N, 1]
    (the scalar broadcast to every row).  Differentiable — in the G phase
    the generator receives direct gradient pressure toward diversity."""
    n = pred_4d.shape[0]
    x = pred_4d.reshape(n, -1).astype(jnp.float32)
    w = valid.astype(jnp.float32)[:, None]

    def _tot(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    cnt = jnp.maximum(_tot(jnp.sum(w)), 1.0)
    mean = _tot(jnp.sum(x * w, axis=0, keepdims=True)) / cnt
    var = _tot(jnp.sum(w * (x - mean) ** 2, axis=0, keepdims=True)) / cnt
    feat = jnp.mean(jnp.sqrt(var + 1e-8))
    return jnp.broadcast_to(feat[None, None], (n, 1))


def spectral_normalize_d(params: Dict, n_iters: int = 30) -> Dict:
    """Spectrally normalize the discriminator's feed-forward Linear weights
    (SN-GAN): every ``w`` in the obsv/pred branches and the classifier is
    divided by its top singular value (power-iteration estimate,
    ops.nn.spectral_normalize).  Biases, the obsv LSTM and the Q-head
    (``latent_dec``) are left untouched — constraining Q's Lipschitz bound
    directly fights the InfoGAN reconstruction objective, and D's
    real/fake decision path is fully normalized without it.

    Stateless: called at every D evaluation on the raw (trained) weights,
    so checkpoints store unnormalized parameters and the flag can be
    toggled mid-training.
    """
    from socialways_tpu.ops.nn import spectral_normalize
    out = dict(params)
    for k in ("obsv_fc", "pred_fc", "classifier"):
        out[k] = [{"w": spectral_normalize(layer["w"], n_iters),
                   "b": layer["b"]} for layer in params[k]]
    return out


def restore_linear_only(backup: Dict, current: Dict) -> Dict:
    """Replicate the reference's buggy partial restore (train.py:311-316):
    take FC weights from ``backup`` but keep ``current``'s LSTM weights."""
    out = dict(current)
    for k in ("obsv_fc", "pred_fc", "classifier", "latent_dec"):
        out[k] = jax.tree_util.tree_map(lambda x: x, backup[k])
    return out
