"""Large-scale crowd simulation (BASELINE.json config 5).

The reference can only predict one 12-step window for tens of agents per
scene.  This module rolls a crowd of up to ~10k agents forward indefinitely:
each window runs the full generator (social attention over all
agents×neighbors via the fused Pallas kernel, then the autoregressive
decode), the predicted steps are appended to the observation buffer, and
the next window re-encodes and re-pools — so the social context refreshes
every ``n_next`` steps (within a window it stays frozen, matching the
reference's ``predict`` semantics, train.py:409-413).

Everything — the window loop included — is one jitted ``lax.scan`` program.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from socialways_tpu.config import TrainConfig
from socialways_tpu.models.generator import generator_rollout


def crowd_simulate(
    g_params: Dict,
    obsv0: jnp.ndarray,          # [N, n_past, 2] initial observed windows
    scene_ids: jnp.ndarray,      # [N]
    n_windows: int,
    rng: jax.Array,
    cfg: TrainConfig,
    noise: jnp.ndarray | None = None,   # [n_windows, N, noise_len] override
) -> jnp.ndarray:
    """Simulate ``n_windows`` prediction windows (n_windows·n_next steps).

    Returns positions [N, n_windows * n_next, 2].  ``noise`` overrides the
    internally drawn stream (used by the sharded variant for exact parity).
    """
    n, n_past, _ = obsv0.shape
    cdt = jnp.dtype(cfg.compute_dtype)
    if cdt != obsv0.dtype:
        g_params = jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, g_params)
        obsv0 = obsv0.astype(cdt)
    if noise is None:
        from socialways_tpu.engine.losses import sample_noise
        keys = jax.random.split(rng, n_windows)
        noise = jax.vmap(
            lambda k: sample_noise(k, n, cfg, obsv0.dtype))(keys)

    def window(carry, z):
        obsv = carry
        # canonicalize per window: each window's frame comes from its own
        # observation buffer (origin = last point, +x = heading),
        # predictions map back to world before re-entering the buffer —
        # so an agent-frame-trained checkpoint sees exactly the canonical
        # inputs it trained on (the shared composition in
        # ops/traj.canonicalize_for_rollout)
        from socialways_tpu.ops.traj import (canonicalize_for_rollout,
                                             from_agent_frame_4d)
        obsv_in, frame, social_x4 = canonicalize_for_rollout(
            obsv, cfg.agent_frame, cfg.use_social)
        pred = generator_rollout(g_params, obsv_in, z, cfg.n_next,
                                 scene_ids, cfg.use_social, cfg.decoder,
                                 cfg.use_pallas, cfg.max_scene_size,
                                 social_states=social_x4)
        if frame is not None:
            pred = from_agent_frame_4d(pred, frame)
        pos = pred[..., :2]
        new_obsv = jnp.concatenate([obsv, pos], axis=1)[:, -n_past:]
        return new_obsv, pos

    _, windows = jax.lax.scan(window, obsv0, noise)
    # [n_windows, N, n_next, 2] → [N, n_windows*n_next, 2]; trajectories are
    # reported in float32 regardless of the compute dtype
    return jnp.moveaxis(windows, 0, 1).reshape(
        n, n_windows * cfg.n_next, 2).astype(jnp.float32)


def crowd_simulate_sharded(
    g_params: Dict,
    obsv0: jnp.ndarray,
    scene_ids: jnp.ndarray,
    n_windows: int,
    rng: jax.Array,
    cfg: TrainConfig,
    mesh,
    axis_name: str = "data",
    noise: jnp.ndarray | None = None,
    neighbor_exchange: str = "gather",
) -> jnp.ndarray:
    """Multi-chip crowd simulation: agents sharded over the mesh; each
    window's social attention runs the agents-axis sharded form
    (parallel.agents), and the encode/decode stay device-local.
    Bit-equivalent to :func:`crowd_simulate` given the same noise stream.

    ``neighbor_exchange``: "gather" (one all_gather of per-agent keys per
    window) or "ring" (ppermute-streamed neighbor blocks + flash softmax —
    constant per-device memory in mesh size)."""
    n, _, _ = obsv0.shape
    cdt = jnp.dtype(cfg.compute_dtype)
    if cdt != obsv0.dtype:
        # same compute-dtype handling as crowd_simulate — without it a
        # bf16 config silently runs the sharded variant in f32 and the
        # documented single-vs-sharded equivalence breaks
        g_params = jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, g_params)
        obsv0 = obsv0.astype(cdt)
    if noise is None:
        from socialways_tpu.engine.losses import sample_noise
        keys = jax.random.split(rng, n_windows)
        noise = jax.vmap(
            lambda k: sample_noise(k, n, cfg, obsv0.dtype))(keys)
    fn = _sharded_sim_program(cfg, n_windows, mesh, axis_name,
                              neighbor_exchange)
    return fn(g_params, obsv0, scene_ids, noise)


@functools.lru_cache(maxsize=None)
def _sharded_sim_program(cfg: TrainConfig, n_windows: int, mesh,
                         axis_name: str, neighbor_exchange: str):
    """Compiled sharded-sim program, cached by (cfg, windows, mesh,
    exchange).  Params enter as a jit ARGUMENT (replicated spec), never a
    closure capture — a captured pytree re-traces on every call and
    embeds the weights as HLO constants (the documented remote_compile
    HTTP-413 failure mode on axon)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from socialways_tpu.models.generator import (decode_rollout,
                                                 encode_observation)
    from socialways_tpu.ops.traj import obsv_to_4d
    from socialways_tpu.parallel.agents import (ring_social_context,
                                                sharded_social_context)

    social_ctx = (ring_social_context if neighbor_exchange == "ring"
                  else sharded_social_context)

    def local_sim(g_params, obsv_local, ids_local, noise_local):
        n_past = obsv_local.shape[1]
        def window(carry, z):
            obsv = carry
            # same per-window canonicalization as crowd_simulate (shared
            # helper); the social geometry source stays the WORLD-frame
            # last-obs states — sharded social_ctx takes x4_last
            # directly, so the agents-axis exchange is untouched
            from socialways_tpu.ops.traj import (canonicalize_for_rollout,
                                                 from_agent_frame_4d)
            obsv_in, frame, social_x4 = canonicalize_for_rollout(
                obsv, cfg.agent_frame, cfg.use_social)
            obsv_4d = obsv_to_4d(obsv_in)
            h, c = encode_observation(g_params, obsv_4d)
            if cfg.use_social:
                x4_geo = (social_x4 if social_x4 is not None
                          else obsv_4d[:, -1])
                s = social_ctx(g_params, x4_geo, h, ids_local, axis_name)
            else:
                s = jnp.zeros_like(h)
            pred = decode_rollout(g_params, (h, c, s, obsv_in[:, -1]), z,
                                  cfg.n_next, cfg.decoder)
            if frame is not None:
                pred = from_agent_frame_4d(pred, frame)
            pos = pred[..., :2]
            return jnp.concatenate([obsv, pos], axis=1)[:, -n_past:], pos

        _, windows = jax.lax.scan(window, obsv_local, noise_local)
        m = obsv_local.shape[0]
        # float32 trajectories regardless of compute dtype, matching
        # crowd_simulate
        return jnp.moveaxis(windows, 0, 1).reshape(
            m, n_windows * cfg.n_next, 2).astype(jnp.float32)

    fn = shard_map(local_sim, mesh=mesh,
                   in_specs=(P(), P(axis_name), P(axis_name),
                             P(None, axis_name)),
                   out_specs=P(axis_name),
                   check_vma=False)
    return jax.jit(fn)


def make_crowd_sim(cfg: TrainConfig, n_windows: int):
    """Jitted simulator with static window count."""
    def run(g_params, obsv0, scene_ids, rng):
        return crowd_simulate(g_params, obsv0, scene_ids, n_windows, rng,
                              cfg)
    return jax.jit(run)


def throughput_agent_steps(n_agents: int, n_windows: int, n_next: int,
                           elapsed_s: float) -> float:
    return n_agents * n_windows * n_next / elapsed_s
