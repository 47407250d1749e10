"""Evaluation: vmapped K-sample ADE/FDE (average and min-of-K).

Parity with the reference ``test()`` (train.py:563-616), with the serial
``for kk in range(n_gen_samples)`` loop replaced by a single ``vmap`` over K
noise draws — one device program evaluates all samples of a chunk under all
K draws at once.

Errors are per-sample, per-step Euclidean distances in normalized units;
divide by ``ss`` (Scale.sx) at the call site for meters, as the reference
does (train.py:587).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from socialways_tpu.config import TrainConfig


class EvalSums(NamedTuple):
    ade_avg: jnp.ndarray
    fde_avg: jnp.ndarray
    ade_min: jnp.ndarray
    fde_min: jnp.ndarray
    n_samples: jnp.ndarray


def k_sample_rollout(g_params: Dict, obsv: jnp.ndarray,
                     scene_ids: jnp.ndarray, rng: jax.Array, k: int,
                     cfg: TrainConfig, axis_name: str | None = None,
                     axis_size: int = 1) -> jnp.ndarray:
    """K stochastic rollouts: [K, N, n_next, 4].

    The observation encoding and social pooling are noise-independent, so
    they run once; only the autoregressive decode is vmapped over K.

    Under ``shard_map`` pass ``axis_name``/``axis_size``: each shard draws
    the GLOBAL batch's noise and keeps its own rows, so sharded eval
    consumes exactly the single-device noise stream (same scheme as
    gan_step)."""
    from socialways_tpu.models.generator import decode_rollout, prepare_rollout

    n = obsv.shape[0]
    cdt = jnp.dtype(cfg.compute_dtype)
    if cdt != obsv.dtype:
        g_params = jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, g_params)
        obsv = obsv.astype(cdt)
    n_glob = n * axis_size
    if cfg.latent_code_type == "categorical" or cfg.noise_dist != "uniform":
        from socialways_tpu.engine.losses import sample_noise
        noise_k = jax.vmap(
            lambda kk: sample_noise(kk, n_glob, cfg, obsv.dtype))(
            jax.random.split(rng, k))
    else:   # exact reference noise stream (train.py:583-585)
        noise_k = jax.random.uniform(rng, (k, n_glob, cfg.noise_len),
                                     obsv.dtype)
    if axis_name is not None:
        from socialways_tpu.engine.train_step import \
            _flat_axis_index            # lazy: engine imports eval
        row0 = _flat_axis_index(axis_name) * n
        noise_k = jax.lax.dynamic_slice_in_dim(noise_k, row0, n, axis=1)
    # canonicalize at the model boundary and map the K rollouts back to
    # world coordinates — callers always see world-frame states (the
    # shared agent_frame × use_social composition, same as gan_step)
    from socialways_tpu.ops.traj import (canonicalize_for_rollout,
                                         from_agent_frame_4d)
    obsv, frame, social_x4 = canonicalize_for_rollout(
        obsv, cfg.agent_frame, cfg.use_social)
    prep = prepare_rollout(g_params, obsv, scene_ids, cfg.use_social,
                           cfg.use_pallas, cfg.max_scene_size,
                           social_states=social_x4)
    out = jax.vmap(
        lambda z: decode_rollout(g_params, prep, z, cfg.n_next, cfg.decoder)
    )(noise_k)
    if frame is not None:
        out = from_agent_frame_4d(out, frame)   # frame [N] broadcasts to K
    return out


def k_sample_errors(pred_hat_k: jnp.ndarray, pred: jnp.ndarray
                    ) -> jnp.ndarray:
    """[K, N, T, {2,4}] predictions vs [N, T, 2] truth → [K, N, T] errors
    (always float32 — bf16 rollouts are scored in full precision)."""
    d = (pred_hat_k[..., :2].astype(jnp.float32)
         - pred[None, ..., :2].astype(jnp.float32))
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def eval_chunk(g_params: Dict, batch: Dict[str, jnp.ndarray], rng: jax.Array,
               k: int, cfg: TrainConfig, axis_name: str | None = None,
               axis_size: int = 1) -> EvalSums:
    """Min-of-K / avg-of-K ADE & FDE sums over one padded chunk
    (train.py:602-607 semantics)."""
    valid = batch["valid"]
    pred_hat_k = k_sample_rollout(g_params, batch["obsvs"],
                                  batch["scene_ids"], rng, k, cfg,
                                  axis_name, axis_size)
    err = k_sample_errors(pred_hat_k, batch["preds"])      # [K, N, T]

    ade_per_k = jnp.mean(err, axis=-1)                     # [K, N]
    fde_per_k = err[..., -1]                               # [K, N]

    def msum(x):
        return jnp.sum(jnp.where(valid, x, 0.0))

    return EvalSums(
        ade_avg=msum(jnp.mean(ade_per_k, axis=0)),
        fde_avg=msum(jnp.mean(fde_per_k, axis=0)),
        ade_min=msum(jnp.min(ade_per_k, axis=0)),
        fde_min=msum(jnp.min(fde_per_k, axis=0)),
        n_samples=jnp.sum(valid).astype(jnp.int32),
    )


def finalize_eval(sums: EvalSums, ss: float, n_test_samples: int
                  ) -> Dict[str, float]:
    """Convert summed normalized errors to per-sample meters
    (train.py:611-614)."""
    denom = ss * n_test_samples
    return {
        "ade_avg": float(sums.ade_avg) / denom,
        "fde_avg": float(sums.fde_avg) / denom,
        "ade_min": float(sums.ade_min) / denom,
        "fde_min": float(sums.fde_min) / denom,
    }
