"""GAN losses (LSGAN + InfoGAN) with padding-aware masking.

Loss structure parity with the reference train() (train.py:471-536):
- LSGAN MSE labels with one-scalar-per-batch smoothing: fake targets are
  ``U(0, 0.1)``, real targets ``U(0.9, 1.0)`` (train.py:471-472);
- InfoGAN Q-loss: MSE between the Q-head output and the first
  ``n_latent_codes`` dims of the (uniform!) noise (train.py:485,516);
- optional L2 and variety losses (off by default, as in the reference).

All means are masked: padded samples contribute nothing, and the denominator
counts only valid elements — with no padding this reduces exactly to the
reference's ``nn.MSELoss`` means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_noise(key: jax.Array, n: int, cfg, dtype=jnp.float32
                 ) -> jnp.ndarray:
    """Draw the generator's noise vector(s), [n, noise_len].

    Continuous (reference parity): uniform [0,1) — the exact stream of
    ``jax.random.uniform(key, (n, noise_len))`` (train.py:473); N(0,1)
    via cfg.noise_dist="gaussian".
    Categorical: a uniform categorical code one-hot-embedded into the first
    ``n_latent_codes`` dims (the rest keeps cfg.noise_dist)."""
    if getattr(cfg, "noise_dist", "uniform") == "gaussian":
        z = jax.random.normal(key, (n, cfg.noise_len), dtype)
    else:
        z = jax.random.uniform(key, (n, cfg.noise_len), dtype)
    if cfg.latent_code_type == "categorical":
        c = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0,
                               cfg.n_latent_codes)
        onehot = jax.nn.one_hot(c, cfg.n_latent_codes, dtype=dtype)
        z = jnp.concatenate([onehot, z[:, cfg.n_latent_codes:]], axis=1)
    return z


def masked_xent(logits: jnp.ndarray, labels: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """Softmax cross-entropy over valid samples. logits [N, C], labels [N]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


def info_loss(code_hat: jnp.ndarray, noise: jnp.ndarray, valid: jnp.ndarray,
              n_latent_codes: int, latent_code_type: str) -> jnp.ndarray:
    """InfoGAN mutual-information surrogate.  The code is always recovered
    from the noise tensor (it is embedded in the first n_latent_codes
    dims), so every caller that has the noise has the target."""
    target = noise[:, :n_latent_codes]
    if latent_code_type == "categorical":
        return masked_xent(code_hat, jnp.argmax(target, axis=-1), valid)
    return masked_mse(code_hat, target, valid)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over valid samples only.

    pred/target: [N, ...]; valid: [N] bool.  Equals nn.MSELoss when all
    valid."""
    sq = (pred - target) ** 2
    # broadcast valid over trailing dims
    v = valid.reshape(valid.shape + (1,) * (sq.ndim - valid.ndim))
    total = jnp.sum(jnp.where(v, sq, 0.0))
    per_sample = 1
    for d in sq.shape[valid.ndim:]:
        per_sample *= d
    count = jnp.sum(valid) * per_sample
    return total / jnp.maximum(count, 1)


def lsgan_d_loss(fake_label, real_label, fake_code, noise, valid,
                 zeros_target, ones_target, use_info_loss: bool,
                 loss_info_w: float, n_latent_codes: int,
                 latent_code_type: str = "continuous", label_valid=None,
                 w_label=1.0, w_info=1.0):
    """Discriminator loss (train.py:482-494). Labels are [N, 1] — or, under
    PacGAN, [N/pac, 1] with ``label_valid`` the per-pack validity (the info
    term stays per-sample on ``valid``).

    ``w_label``/``w_info`` scale the label and info terms separately —
    gradient accumulation uses them to weight each micro-chunk's label term
    by valid-PACK share and its info term by valid-SAMPLE share, which is
    what makes the accumulated pac>1 loss exactly equal the full-batch one
    even when the padding tail creates a mixed (partially-valid) pack."""
    lv = valid if label_valid is None else label_valid
    m = fake_label.shape[0]
    loss = w_label * (masked_mse(fake_label, zeros_target[:m], lv)
                      + masked_mse(real_label, ones_target[:m], lv))
    if use_info_loss:
        loss = loss + w_info * loss_info_w * info_loss(
            fake_code, noise, valid, n_latent_codes, latent_code_type)
    return loss


def lsgan_g_loss(gen_label, gen_code, noise, valid, ones_target,
                 use_info_loss: bool, loss_info_w: float,
                 n_latent_codes: int, latent_code_type: str = "continuous",
                 label_valid=None, w_label=1.0, w_info=1.0):
    """Generator fooling (+ info) loss (train.py:510-523).  ``label_valid``
    and the ``w_label``/``w_info`` term weights as in :func:`lsgan_d_loss`."""
    lv = valid if label_valid is None else label_valid
    m = gen_label.shape[0]
    loss = w_label * masked_mse(gen_label, ones_target[:m], lv)
    if use_info_loss:
        loss = loss + w_info * loss_info_w * info_loss(
            gen_code, noise, valid, n_latent_codes, latent_code_type)
    return loss


def l2_traj_loss(pred_hat_p, pred_p, valid):
    """Plain L2 between predicted and true positions (train.py:512)."""
    return masked_mse(pred_hat_p, pred_p, valid)


def variety_loss(pred_hat_p_k, pred_p, valid):
    """Min-over-K sample L2 (SGAN variety loss).  The reference's version
    (train.py:527-536) is broken — it indexes samples by the K loop variable
    and reuses one noise draw; this is the corrected min-of-K per-sample
    form, vmapped over K.

    pred_hat_p_k: [K, N, T, 2]; pred_p: [N, T, 2]."""
    sq = jnp.mean((pred_hat_p_k - pred_p[None]) ** 2, axis=(-2, -1))  # [K, N]
    per_sample_min = jnp.min(sq, axis=0)                              # [N]
    return jnp.sum(jnp.where(valid, per_sample_min, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


def traj_errors(pred_hat_p, pred_p):
    """Per-sample, per-step Euclidean error [N, T] in normalized units
    (train.py:546-551 computes these /ss; de-scale at the call site)."""
    return jnp.sqrt(jnp.sum((pred_hat_p - pred_p) ** 2, axis=-1))
