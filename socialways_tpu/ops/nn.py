"""Minimal functional NN building blocks.

The framework is pure-functional: parameters are pytrees (nested dicts of
jnp arrays) built by ``*_init`` functions and consumed by pure ``*_apply``
functions.  No module objects, no hidden state — everything composes with
``jit`` / ``vmap`` / ``lax.scan`` / ``shard_map``.

Initialization follows the torch ``nn.Linear`` / ``nn.LSTM`` reset rule the
reference relies on (U(-1/sqrt(fan), 1/sqrt(fan)) for weights and biases):
GAN training dynamics are sensitive to init scale, so we match it.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp


Params = Dict[str, jnp.ndarray]


def linear_init(key: jax.Array, in_dim: int, out_dim: int,
                dtype=jnp.float32) -> Params:
    """torch-style uniform init: U(-1/sqrt(in_dim), 1/sqrt(in_dim))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Matmul with float32 accumulation, output in the activation dtype.

    Under bfloat16 mixed precision the MXU takes bf16 operands but the
    partial sums accumulate in f32 (preferred_element_type); the result is
    cast back so activations stay bf16 between layers."""
    y = (jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
         + p["b"].astype(jnp.float32))
    return y.astype(x.dtype)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


def spectral_normalize(w: jnp.ndarray, n_iters: int = 30,
                       eps: float = 1e-12) -> jnp.ndarray:
    """``w / sigma_max(w)`` with the top singular value estimated by power
    iteration (SN-GAN, Miyato et al. 2018).

    Pure-functional form of the usual stateful trick: instead of carrying a
    persistent ``u`` buffer across steps, every call runs ``n_iters`` power
    iterations from a fixed deterministic start vector.  The matrices here
    are tiny (≤128×64 — D's FC blocks), so the extra matvecs are noise next
    to the LSTM scans; in exchange the op stays stateless, jit-friendly and
    checkpoint-compatible (no new state fields).  ``u``/``v`` are
    stop-gradiented, so the gradient flows through ``w`` in both the
    numerator and ``sigma = u @ w @ v`` — matching the reference SN-GAN
    backward.
    """
    u = jnp.full((w.shape[0],), 1.0 / (w.shape[0] ** 0.5), w.dtype)
    for _ in range(n_iters):
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = w @ v
        u = u / (jnp.linalg.norm(u) + eps)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ w @ v
    return w / jnp.maximum(sigma, eps)


def mlp_init(key: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> list:
    """Chain of linear layers with the given dims, e.g. [3, 32, 64, 64]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, dims[i], dims[i + 1], dtype)
            for i, k in enumerate(keys)]


def mlp_apply(layers: list, x: jnp.ndarray,
              activation: Callable = jax.nn.relu,
              final_activation: Callable | None = None) -> jnp.ndarray:
    """Apply the chain, with ``activation`` between layers (not after the
    last one unless ``final_activation`` is given)."""
    n = len(layers)
    for i, p in enumerate(layers):
        x = linear_apply(p, x)
        if i < n - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x
