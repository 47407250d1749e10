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
) -> jnp.ndarray:
    """Simulate ``n_windows`` prediction windows (n_windows·n_next steps).

    Returns positions [N, n_windows * n_next, 2]."""
    n, n_past, _ = obsv0.shape

    def window(carry, key):
        obsv = carry
        noise = jax.random.uniform(key, (n, cfg.noise_len), obsv.dtype)
        pred = generator_rollout(g_params, obsv, noise, cfg.n_next,
                                 scene_ids, cfg.use_social, cfg.decoder,
                                 cfg.use_pallas)
        pos = pred[..., :2]
        new_obsv = jnp.concatenate([obsv, pos], axis=1)[:, -n_past:]
        return new_obsv, pos

    keys = jax.random.split(rng, n_windows)
    _, windows = jax.lax.scan(window, obsv0, keys)
    # [n_windows, N, n_next, 2] → [N, n_windows*n_next, 2]
    return jnp.moveaxis(windows, 0, 1).reshape(n, n_windows * cfg.n_next, 2)


def make_crowd_sim(cfg: TrainConfig, n_windows: int):
    """Jitted simulator with static window count."""
    def run(g_params, obsv0, scene_ids, rng):
        return crowd_simulate(g_params, obsv0, scene_ids, n_windows, rng,
                              cfg)
    return jax.jit(run)


def throughput_agent_steps(n_agents: int, n_windows: int, n_next: int,
                           elapsed_s: float) -> float:
    return n_agents * n_windows * n_next / elapsed_s
