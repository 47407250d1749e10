"""Constant-acceleration Kalman filter/smoother for trajectories.

Re-activates the reference's dead `MyKalman` (utils/linear_models.py:23-97,
fully commented out upstream and dependent on the unvendored ``pykalman``):
the same 6-state constant-acceleration model — state (x, y, vx, vy, ax, ay),
position-only observations, the same A/C/Q/R matrices (Q is the
continuous-white-noise-acceleration form scaled by 0.5, R = I,
linear_models.py:28-66) — rebuilt as pure-functional JAX.

Differences from the dead reference code, by design:
- No pykalman EM re-estimation (``kf.em(measurement, n_iter=4)``): the
  matrices are fixed.  EM per-track is a host-side O(T·iter) loop that
  cannot batch on an MXU; the fixed-matrix filter/smoother is a pair of
  ``lax.scan``s, jit/vmap-composable with everything else.
- The filter is exposed batched: leading dims broadcast via vmap-free
  einsum-style scans, so ``[B, T, 2]`` tracks filter in one XLA program.
- ``predict_kalman`` adds a forecasting baseline (filter the observation,
  roll the state forward with A) comparable to ``predict_cv``
  (ops/traj.py:40) in eval pipelines.

The reference's single-measurement smoother guard (linear_models.py:78-80:
return the measurement and zero velocity) is preserved.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class KalmanModel(NamedTuple):
    """Fixed linear-Gaussian model matrices (f64/f32 [6,6]/[2,6]/[6,6]/[2,2])."""
    A: jnp.ndarray   # transition
    C: jnp.ndarray   # observation (selects position)
    Q: jnp.ndarray   # process noise
    R: jnp.ndarray   # observation noise


def kalman_matrices(dt: float, dtype=jnp.float32) -> KalmanModel:
    """The reference's constant-acceleration model (linear_models.py:28-66)."""
    t = float(dt)
    A = jnp.array([[1, 0, t, 0, t ** 2, 0],
                   [0, 1, 0, t, 0, t ** 2],
                   [0, 0, 1, 0, t, 0],
                   [0, 0, 0, 1, 0, t],
                   [0, 0, 0, 0, 1, 0],
                   [0, 0, 0, 0, 0, 1]], dtype=dtype)
    C = jnp.array([[1, 0, 0, 0, 0, 0],
                   [0, 1, 0, 0, 0, 0]], dtype=dtype)
    Q = jnp.array(
        [[t**5 / 20, 0, t**4 / 8, 0, t**3 / 6, 0],
         [0, t**5 / 20, 0, t**4 / 8, 0, t**3 / 6],
         [t**4 / 8, 0, t**3 / 3, 0, t**2 / 2, 0],
         [0, t**4 / 8, 0, t**3 / 3, 0, t**2 / 2],
         [t**3 / 6, 0, t**2 / 2, 0, t, 0],
         [0, t**3 / 6, 0, t**2 / 2, 0, t]], dtype=dtype) * 0.5
    R = jnp.eye(2, dtype=dtype)            # r = 1 (linear_models.py:63-65)
    return KalmanModel(A, C, Q, R)


def _init_state(z0: jnp.ndarray, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prior: mean at the first measurement with zero velocity/acceleration,
    diffuse velocity/acceleration variance (pykalman would EM-learn this;
    a diffuse prior converges to the same filtered tail in a few steps)."""
    m0 = jnp.concatenate([z0, jnp.zeros(4, dtype)])
    P0 = jnp.diag(jnp.array([1.0, 1.0, 10.0, 10.0, 10.0, 10.0], dtype))
    return m0, P0


def _filter_scan(measurements: jnp.ndarray, model: KalmanModel):
    """Core forward pass on one [T, 2] track.

    Returns (filtered means [T,6], filtered covs [T,6,6],
             predicted means [T,6], predicted covs [T,6,6]) where
    predicted[t] is the one-step-ahead prior used at t (needed by RTS)."""
    A, C, Q, R = model
    dtype = measurements.dtype
    m0, P0 = _init_state(measurements[0], dtype)

    def step(carry, z):
        m, P = carry                        # posterior at t-1
        mp = A @ m                          # predict
        Pp = A @ P @ A.T + Q
        S = C @ Pp @ C.T + R                # innovation
        K = jnp.linalg.solve(S.T, (Pp @ C.T).T).T   # gain, via solve not inv
        m_new = mp + K @ (z - C @ mp)
        KC = K @ C
        I6 = jnp.eye(6, dtype=dtype)
        # Joseph form: keeps P symmetric PSD under f32 round-off
        P_new = (I6 - KC) @ Pp @ (I6 - KC).T + K @ R @ K.T
        return (m_new, P_new), (m_new, P_new, mp, Pp)

    # step 0 updates the diffuse prior with z0 directly (no transition)
    S0 = C @ P0 @ C.T + R
    K0 = jnp.linalg.solve(S0.T, (P0 @ C.T).T).T
    m_f0 = m0 + K0 @ (measurements[0] - C @ m0)
    I6 = jnp.eye(6, dtype=dtype)
    KC0 = K0 @ C
    P_f0 = (I6 - KC0) @ P0 @ (I6 - KC0).T + K0 @ R @ K0.T

    (_, _), (ms, Ps, mps, Pps) = lax.scan(step, (m_f0, P_f0), measurements[1:])
    ms = jnp.concatenate([m_f0[None], ms], axis=0)
    Ps = jnp.concatenate([P_f0[None], Ps], axis=0)
    mps = jnp.concatenate([m0[None], mps], axis=0)
    Pps = jnp.concatenate([P0[None], Pps], axis=0)
    return ms, Ps, mps, Pps


def kalman_filter(measurements: jnp.ndarray, dt: float = 1.0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Filter [..., T, 2] position tracks.

    Returns (positions [..., T, 2], velocities [..., T, 2]) — the filtered
    state means, matching the reference's ``MyKalman.filter`` return slices
    (linear_models.py:71-74: ``means[:, 0:2], means[:, 2:4]``)."""
    model = kalman_matrices(dt, measurements.dtype)
    batch = measurements.shape[:-2]
    flat = measurements.reshape((-1,) + measurements.shape[-2:])
    ms, _, _, _ = jax.vmap(lambda z: _filter_scan(z, model))(flat)
    ms = ms.reshape(batch + ms.shape[-2:])
    return ms[..., 0:2], ms[..., 2:4]


def kalman_smooth(measurements: jnp.ndarray, dt: float = 1.0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RTS-smooth [..., T, 2] tracks → (positions, velocities).

    A single-measurement track returns (measurement, zero velocity), the
    reference's explicit guard (linear_models.py:78-80).  T is static under
    jit, so the guard is a Python branch."""
    if measurements.shape[-2] == 1:
        return measurements, jnp.zeros_like(measurements)
    model = kalman_matrices(dt, measurements.dtype)
    batch = measurements.shape[:-2]
    flat = measurements.reshape((-1,) + measurements.shape[-2:])

    def smooth_one(z):
        ms, Ps, mps, Pps = _filter_scan(z, model)
        A = model.A

        def back(carry, xs):
            m_next, P_next = carry          # smoothed at t+1
            m_f, P_f, mp_next, Pp_next = xs  # filtered at t, predicted at t+1
            # G = P_f A^T Pp_next^{-1}, via solve on the symmetric Pp
            G = jnp.linalg.solve(Pp_next, (P_f @ A.T).T).T
            m_s = m_f + G @ (m_next - mp_next)
            P_s = P_f + G @ (P_next - Pp_next) @ G.T
            return (m_s, P_s), m_s

        last = (ms[-1], Ps[-1])
        xs = (ms[:-1], Ps[:-1], mps[1:], Pps[1:])
        _, sm = lax.scan(back, last, xs, reverse=True)
        return jnp.concatenate([sm, ms[-1:][..., :]], axis=0)

    sm = jax.vmap(smooth_one)(flat).reshape(batch + measurements.shape[-2:-1] + (6,))
    return sm[..., 0:2], sm[..., 2:4]


def predict_kalman(obsv: jnp.ndarray, n_next: int, dt: float = 1.0
                   ) -> jnp.ndarray:
    """Forecasting baseline: Kalman-filter the observation, then roll the
    final state forward ``n_next`` steps with the transition A.  Same
    signature/contract as ``predict_cv`` (ops/traj.py:40):
    [..., T, 2] → [..., n_next, 2]."""
    model = kalman_matrices(dt, obsv.dtype)
    batch = obsv.shape[:-2]
    flat = obsv.reshape((-1,) + obsv.shape[-2:])

    def forecast_one(z):
        ms, _, _, _ = _filter_scan(z, model)

        def roll(m, _):
            m2 = model.A @ m
            return m2, m2[0:2]

        _, pos = lax.scan(roll, ms[-1], None, length=n_next)
        return pos

    pos = jax.vmap(forecast_one)(flat)
    return pos.reshape(batch + (n_next, 2))
