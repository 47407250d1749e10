"""The jitted unrolled-InfoGAN training step.

Functional re-design of the reference epoch body (train.py:439-560):

- the reference's ``copy.deepcopy(D)`` unrolled-GAN snapshot becomes a pytree
  value (free — everything is immutable);
- the D lookahead is a static Python loop of functional Adam steps (the
  unroll count is a compile-time constant, so XLA sees straight-line code);
- the same uniform noise tensor drives every D unroll step and the G step
  (train.py:473), and the fake rollout is computed ONCE — the reference
  recomputed the identical rollout under no_grad each unroll iteration;
- D restoration after the G step is configurable (config.d_restore):
  "full" restores the whole post-first-update D (fixing the reference's
  Linear-only restore bug, train.py:311-316), "reference" replicates the
  bug, "none" keeps the unrolled D.  The D optimizer state stays advanced in
  all modes, matching the reference.

Everything here is shape-static: samples are padded and masked, so one
compiled step serves every chunk.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import functools

import jax
import jax.numpy as jnp
import optax

from socialways_tpu.config import TrainConfig
from socialways_tpu.engine.losses import (
    l2_traj_loss,
    lsgan_d_loss,
    lsgan_g_loss,
    sample_noise,
    traj_errors,
    variety_loss,
)
from socialways_tpu.models.discriminator import (
    discriminator_apply,
    restore_linear_only,
)
from socialways_tpu.models.generator import generator_rollout
from socialways_tpu.ops.traj import get_traj_4d


class TrainState(NamedTuple):
    g_params: Dict
    d_params: Dict
    g_opt: optax.OptState
    d_opt: optax.OptState
    # EMA of g_params (cfg.g_ema_decay > 0), else None — None contributes
    # no pytree leaves, so checkpoints without EMA keep their layout
    g_ema: Dict | None = None


def eval_params(state: TrainState) -> Dict:
    """Generator params to EVALUATE with: the EMA shadow when tracked
    (classic GAN variance reducer), else the raw training params."""
    return state.g_ema if state.g_ema is not None else state.g_params


class StepMetrics(NamedTuple):
    d_loss: jnp.ndarray
    g_loss: jnp.ndarray
    ade_sum: jnp.ndarray   # Σ per-sample mean-over-time error (normalized units)
    fde_sum: jnp.ndarray   # Σ per-sample final-step error
    n_samples: jnp.ndarray


def make_optimizers(cfg: TrainConfig) -> Tuple[optax.GradientTransformation,
                                               optax.GradientTransformation]:
    def tx(lr, decay_rate, decay_steps, warmup_steps):
        if decay_rate != 1.0 and decay_steps > 0:
            lr = optax.exponential_decay(
                lr, transition_steps=decay_steps,
                decay_rate=decay_rate, staircase=True)
        if warmup_steps > 0:
            base = lr if callable(lr) else (lambda step, v=lr: v)

            def lr(step, base=base, w=warmup_steps):
                return base(step) * jnp.minimum(1.0, (step + 1.0) / w)
        adam = optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2)
        if cfg.grad_clip > 0:
            return optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                               adam)
        return adam
    # D-only decay/warmup override the shared schedules for the D optimizer
    if cfg.d_lr_decay_steps > 0:
        d_decay = (cfg.d_lr_decay_rate, cfg.d_lr_decay_steps)
    else:
        d_decay = (cfg.lr_decay_rate, cfg.lr_decay_steps)
    d_warmup = cfg.d_lr_warmup_steps or cfg.lr_warmup_steps
    return (tx(cfg.lr_g, cfg.lr_decay_rate, cfg.lr_decay_steps,
               cfg.lr_warmup_steps),
            tx(cfg.lr_d, *d_decay, d_warmup))


def _flat_axis_index(axis_name) -> jnp.ndarray:
    """Row-major flattened device index over one axis name or a tuple of
    them — e.g. over a hierarchical ``("dcn", "data")`` mesh the index runs
    dcn-major, matching the device order of the equivalent flat 1-D mesh,
    so global-draw-and-slice noise streams are identical between the flat
    and hierarchical data-parallel forms."""
    if isinstance(axis_name, (tuple, list)):
        idx = jnp.zeros((), jnp.int32)
        for a in axis_name:
            idx = idx * jax.lax.psum(1, a) + jax.lax.axis_index(a)
        return idx
    return jax.lax.axis_index(axis_name)


def _g_step_count(g_opt) -> jnp.ndarray:
    """Number of completed GAN steps, read from the G optimizer's Adam
    ``count`` (G updates exactly once per gan_step, so the count IS the
    global step index — no extra state field, so checkpoints stay
    compatible)."""
    adam_states = [
        s for s in jax.tree_util.tree_leaves(
            g_opt, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    if not adam_states:
        raise ValueError("G optimizer state has no ScaleByAdamState")
    return adam_states[0].count


def transplant_schedule_clock(restored: TrainState,
                              clock: TrainState) -> TrainState:
    """Return ``restored`` with every optimizer ``count`` leaf taken from
    ``clock``.

    Checkpoint-restore rescues (``--auto-recover``, ``--stall-recover``)
    rewind the optimizer counts, and with them every count-keyed schedule:
    the D-instance-noise sigma anneal, staircase lr decay, and the
    D/G-update-ratio switch all jump backwards — measured to FIGHT the
    anneal (BASELINE.md: the rescue re-raises sigma the anneal had already
    taken to ~0).  With this transplant the rescue restores params and
    optimizer moments but keeps the schedules on the monotonic wall clock.
    Adam's bias correction reads the transplanted (larger) count; past the
    first ~1k steps the correction factor is ~1 either way, so moments stay
    consistent.
    """
    def merge(path, r, c):
        last = path[-1]
        name = getattr(last, "name", None) or getattr(last, "key", None)
        return c if name == "count" else r
    return restored._replace(
        g_opt=jax.tree_util.tree_map_with_path(merge, restored.g_opt,
                                               clock.g_opt),
        d_opt=jax.tree_util.tree_map_with_path(merge, restored.d_opt,
                                               clock.d_opt))


def init_train_state(key: jax.Array, cfg: TrainConfig) -> TrainState:
    from socialways_tpu.models.generator import init_generator
    from socialways_tpu.models.discriminator import init_discriminator

    if cfg.n_lstm_layers != 1:
        raise ValueError(
            "n_lstm_layers must be 1: the reference's decoder wiring only "
            "supports a single encoder layer (see config.py)")
    dtype = jnp.dtype(cfg.dtype)
    kg, kd = jax.random.split(key)
    g_params = init_generator(kg, cfg, dtype)
    d_params = init_discriminator(kd, cfg, dtype)
    g_tx, d_tx = make_optimizers(cfg)
    g_ema = g_params if cfg.g_ema_decay > 0 else None
    return TrainState(g_params, d_params, g_tx.init(g_params),
                      d_tx.init(d_params), g_ema)


def gan_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    cfg: TrainConfig,
    axis_name: str | tuple | None = None,
    axis_size: int = 1,
) -> Tuple[TrainState, StepMetrics]:
    """One GAN update on a padded scene chunk.

    batch: obsvs [N, n_past, 2], preds [N, n_next, 2], scene_ids [N],
    valid [N] bool.

    Under ``shard_map`` pass ``axis_name`` and the mesh ``axis_size``:
    gradients are ``pmean``-ed over the mesh axis (data-parallel — each
    device holds whole scenes, so the NxN social attention never crosses a
    device boundary) and metric sums are ``psum``-ed.  Noise is drawn for
    the GLOBAL batch and each shard slices its own rows, so an n-way DP
    step consumes exactly the noise stream of the single-device big-batch
    step — metrics and updates match the single-device run up to float
    reassociation (tests/test_parallel.py).  The per-batch label-smoothing
    scalars are identical everywhere by construction.
    """
    g_tx, d_tx = make_optimizers(cfg)
    dtype = jnp.dtype(cfg.dtype)
    cdt = jnp.dtype(cfg.compute_dtype)
    if cdt == dtype:
        cast = lambda t: t                       # exact-parity fast path
    else:
        # bf16 mixed precision: forward math in cdt, losses/grads/optimizer
        # in the master dtype (grads of an astype cast back automatically)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    obsv = batch["obsvs"].astype(dtype)
    pred = batch["preds"].astype(dtype)
    # canonicalize per agent (ops/traj.canonicalize_for_rollout): the
    # whole step — G, D, Q, every loss — then runs in agent-centric
    # coordinates.  An isometry per row, so loss values equal the
    # world-frame ones and the transform composes freely with DP sharding
    # and grad-accum chunking (both row-aligned).
    from socialways_tpu.ops.traj import (canonicalize_for_rollout,
                                         to_agent_frame)
    obsv, _af, social_x4 = canonicalize_for_rollout(
        obsv, cfg.agent_frame, cfg.use_social)
    if _af is not None:
        pred = to_agent_frame(pred, _af)
    scene_ids, valid = batch["scene_ids"], batch["valid"]
    n = obsv.shape[0]
    if cfg.pac > 1 and n % cfg.pac:
        raise ValueError(f"batch rows {n} not divisible by pac {cfg.pac}")

    def group_valid(v):
        """Per-pack validity for the PacGAN classifier: a pack counts only
        when ALL its samples are valid (packs are consecutive rows; padding
        sits at the batch tail, so at most one pack is mixed)."""
        return v if cfg.pac == 1 else jnp.all(
            v.reshape(-1, cfg.pac), axis=1)

    k_noise, k_zero, k_one, k_var = jax.random.split(rng, 4)
    if axis_name is not None:
        # each shard draws the whole global batch's noise and keeps its own
        # rows — the trivially small [N_global, noise_len] draw buys exact
        # stream parity with the single-device big-batch step
        row0 = _flat_axis_index(axis_name) * n

        def draw_noise(key):
            z = sample_noise(key, n * axis_size, cfg, obsv.dtype)
            return jax.lax.dynamic_slice_in_dim(z, row0, n)
    else:
        def draw_noise(key):
            return sample_noise(key, n, cfg, obsv.dtype)

    # cfg.mb_std / cfg.ms_weight couple shards through psum'd batch
    # statistics: the backward of that psum mixes every shard's cotangent
    # into every shard's gradient, so weighting GRADIENTS by valid-count
    # share (below) would double-weight the coupled term.  Weighting each
    # shard's LOSS by the same share instead (then plain pmean) is
    # algebraically identical for uncoupled losses and exactly right for
    # coupled ones — and makes the pmean'd loss metric the true global
    # masked mean.
    if axis_name is not None and (cfg.mb_std or cfg.ms_weight > 0
                                  or cfg.ds_weight > 0):
        _cnt = jnp.sum(valid).astype(obsv.dtype)
        _w_shard = (_cnt * jax.lax.psum(jnp.ones((), obsv.dtype), axis_name)
                    / jnp.maximum(jax.lax.psum(_cnt, axis_name), 1.0))
    else:
        _w_shard = None

    def _shard_weight(loss):
        return loss if _w_shard is None else loss * _w_shard

    def _sync_grads(grads):
        """pmean with per-shard valid-count weighting: exactly equals the
        single-device masked-mean gradient over the global batch, even when
        shards carry different amounts of padding.  (With cfg.mb_std the
        weight was already applied to the loss — see _shard_weight.)"""
        if axis_name is None:
            return grads
        if _w_shard is None:
            local = jnp.sum(valid).astype(obsv.dtype)
            n_dev = jax.lax.psum(jnp.ones((), obsv.dtype), axis_name)
            glob = jax.lax.psum(local, axis_name)
            w = local * n_dev / jnp.maximum(glob, 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * w, grads)
        return jax.lax.pmean(grads, axis_name)
    # uniform [0,1) noise (with the latent code embedded in the first dims
    # when categorical), shared by all D unroll steps and the G step
    noise = draw_noise(k_noise)
    # one label-smoothing scalar per batch (train.py:471-472)
    zeros_t = jnp.zeros((n, 1), obsv.dtype) + jax.random.uniform(
        k_zero, (), obsv.dtype, 0.0, 0.1)
    ones_t = jnp.ones((n, 1), obsv.dtype) * jax.random.uniform(
        k_one, (), obsv.dtype, 0.9, 1.0)

    obsv_4d, pred_4d = get_traj_4d(obsv, pred)

    # info-weight schedule (config.loss_info_w_end): linear ramp from
    # loss_info_w to loss_info_w_end over loss_info_w_steps GAN steps —
    # a traced scalar, so one compiled step serves the whole ramp
    if cfg.loss_info_w_end > 0 and cfg.loss_info_w_steps > 0:
        _step = _g_step_count(state.g_opt).astype(dtype)
        frac = jnp.minimum(1.0, _step / cfg.loss_info_w_steps)
        info_w = cfg.loss_info_w + (cfg.loss_info_w_end
                                    - cfg.loss_info_w) * frac
    else:
        info_w = cfg.loss_info_w

    def rollout_on(g_params, obsv_, z, sids, social_states=None):
        out = generator_rollout(cast(g_params), cast(obsv_), cast(z),
                                cfg.n_next, sids, cfg.use_social,
                                cfg.decoder, cfg.use_pallas,
                                cfg.max_scene_size, cfg.remat_steps,
                                cast(social_states))
        return out.astype(dtype)

    def rollout(g_params, z):
        return rollout_on(g_params, obsv, z, scene_ids, social_x4)

    # ---- exact gradient accumulation (cfg.grad_accum > 1) ----------------
    # rows are split into equal micro-chunks; each phase's gradient is a
    # lax.scan over chunks accumulating w_c * grad_c with w_c = the chunk's
    # share of valid rows — identical (up to reassociation) to the
    # full-batch masked-mean gradient, while only one chunk's vjp
    # residuals are ever live.  See config.grad_accum for the alignment
    # contract (scenes must not cross chunk boundaries).
    accum = cfg.grad_accum > 1
    if accum:
        if cfg.use_variety_loss:
            raise ValueError("grad_accum>1 does not support the variety "
                             "loss (each chunk would re-draw K rollouts)")
        if cfg.ms_weight > 0 or cfg.ds_weight > 0:
            raise ValueError("grad_accum>1 does not support the "
                             "mode-seeking/diversity-hinge losses (they "
                             "need a second rollout under grad)")
        if n % cfg.grad_accum:
            raise ValueError(f"batch rows {n} not divisible by "
                             f"grad_accum {cfg.grad_accum}")
        n_chunk = n // cfg.grad_accum
        if cfg.pac > 1 and n_chunk % cfg.pac:
            raise ValueError(f"micro-chunk rows {n_chunk} not divisible "
                             f"by pac {cfg.pac}")

        def chunk(t):
            return t.reshape((cfg.grad_accum, n_chunk) + t.shape[1:])

        mb = {"obsv": chunk(obsv), "pred_4d": chunk(pred_4d),
              "obsv_4d": chunk(obsv_4d), "noise": chunk(noise),
              "scene_ids": chunk(scene_ids), "valid": chunk(valid),
              "zeros": chunk(zeros_t), "ones": chunk(ones_t),
              "pred": chunk(pred)}
        if social_x4 is not None:
            mb["social_x4"] = chunk(social_x4)
        # dual per-chunk weights: sample terms (info/r1/l2) accumulate by
        # valid-SAMPLE share, label terms by valid-PACK share (pac>1 means a
        # mixed padding-tail pack counts toward samples but not packs, and a
        # single weight would skew the label gradient; with pac==1 the two
        # are identical).  Σ_c w_c · chunk-masked-mean == global masked mean
        # exactly, per term.
        chunk_w = (jnp.sum(mb["valid"], axis=1).astype(dtype)
                   / jnp.maximum(jnp.sum(valid), 1).astype(dtype))
        gv_chunks = group_valid(valid).reshape(cfg.grad_accum, -1)
        pack_w = (jnp.sum(gv_chunks, axis=1).astype(dtype)
                  / jnp.maximum(jnp.sum(gv_chunks), 1).astype(dtype))

        def _accum_value_and_grad(chunk_loss_fn, params):
            """(Σ loss_c, Σ grad_c) over micro-chunks; ``chunk_loss_fn``
            receives (params, cb, w_sample, w_pack) and returns the chunk's
            already-weighted loss."""
            def body(carry, xs):
                cb, ws, wp = xs
                l_c, g_c = jax.value_and_grad(chunk_loss_fn)(
                    params, cb, ws, wp)
                return (carry[0] + l_c,
                        jax.tree_util.tree_map(
                            lambda a, g: a + g, carry[1], g_c)), None
            init = (jnp.zeros((), dtype),
                    jax.tree_util.tree_map(jnp.zeros_like, params))
            (loss, grads), _ = jax.lax.scan(body, init,
                                            (mb, chunk_w, pack_w))
            return loss, grads

    # fake rollout — same value every unroll iteration AND in the G step
    # (same noise, same pre-update G; the reference recomputed it 3×,
    # train.py:479,507).  One jax.vjp gives the forward value for the D
    # phase and the pullback for the G gradient, so the 20-step
    # encode+decode scan runs ONCE per step instead of twice.  (The
    # variety loss needs grads through k extra rollouts, so that path
    # keeps the plain value_and_grad form; serial_rollout opts out of the
    # sharing so the rollout's backward residuals are not held live
    # across the D phase — see config.serial_rollout.)
    if accum:
        # forward-only per-chunk map (a scan — no residuals kept); the G
        # phase recomputes each chunk's rollout under grad, so accumulation
        # implies serial-rollout memory behavior
        pred_hat_c = jax.lax.map(
            lambda cb: rollout_on(state.g_params, cb["obsv"], cb["noise"],
                                  cb["scene_ids"], cb.get("social_x4")),
            mb)
        mb["pred_hat"] = jax.lax.stop_gradient(pred_hat_c)
        pred_hat_fwd = pred_hat_c.reshape((n,) + pred_hat_c.shape[2:])
        rollout_vjp = None
    elif (cfg.use_variety_loss or cfg.serial_rollout
          or cfg.ms_weight > 0 or cfg.ds_weight > 0):
        # variety/mode-seeking/diversity-hinge need grads of g_params
        # through EXTRA rollouts, so the single shared vjp cannot carry
        # the G gradient
        pred_hat_fwd, rollout_vjp = rollout(state.g_params, noise), None
    else:
        pred_hat_fwd, rollout_vjp = jax.vjp(
            lambda gp: rollout(gp, noise), state.g_params)
    pred_hat_4d_d = jax.lax.stop_gradient(pred_hat_fwd)

    # ---- D instance noise (cfg.d_input_noise > 0) -------------------------
    # Gaussian noise on the prediction inputs of every D evaluation (fake
    # AND real futures; the shared observation branch stays clean), std
    # annealed linearly to 0 over d_input_noise_steps GAN steps.  One draw
    # per phase, shared across the D unroll steps (consistent with the
    # shared fake rollout); the G phase gets a fresh draw.  The key derives
    # via fold_in so existing configs' noise streams are untouched.
    pred_4d_d, eps_g, sigma = pred_4d, None, None
    if cfg.d_input_noise > 0:
        step0 = _g_step_count(state.g_opt).astype(dtype)
        if cfg.d_input_noise_steps > 0:
            sigma = cfg.d_input_noise * jnp.maximum(
                0.0, 1.0 - step0 / cfg.d_input_noise_steps)
            if cfg.d_input_noise_floor > 0:
                # anneal-to-a-floor: early training gets the full σ ramp,
                # late training keeps the constant floor that prevents
                # D-overfit divergence (BASELINE.md LOO stabilizer A/B)
                sigma = jnp.maximum(
                    sigma, jnp.asarray(cfg.d_input_noise_floor, dtype))
        else:
            sigma = jnp.asarray(cfg.d_input_noise, dtype)
        kf, kr, kg = jax.random.split(jax.random.fold_in(rng, 13), 3)

        def draw_eps(key, shape):
            # same global-draw-and-slice trick as draw_noise: under DP each
            # shard draws the global batch's eps and keeps its own rows, so
            # the sharded step consumes exactly the single-device stream
            if axis_name is None:
                return jax.random.normal(key, shape, dtype)
            e = jax.random.normal(
                key, (shape[0] * axis_size,) + shape[1:], dtype)
            return jax.lax.dynamic_slice_in_dim(e, row0, shape[0])

        pred_hat_4d_d = pred_hat_4d_d + sigma * draw_eps(
            kf, pred_hat_4d_d.shape)
        pred_4d_d = pred_4d + sigma * draw_eps(kr, pred_4d.shape)
        eps_g = draw_eps(kg, pred_hat_4d_d.shape)
        if accum:
            mb["pred_hat"] = chunk(pred_hat_4d_d)
            mb["pred_4d"] = chunk(pred_4d_d)
            mb["eps_g"] = chunk(eps_g)

    # ---------------- D phase: n_unrolling_steps + 1 updates --------------
    # the observation branch is shared between the fake and real passes
    # (the reference runs the full D twice, train.py:482-487); encode once
    # and run both futures through the heads as one [2N] batch
    from socialways_tpu.models.discriminator import (discriminator_heads,
                                                     encode_obsv,
                                                     mb_std_feature,
                                                     spectral_normalize_d)

    _sn = (spectral_normalize_d if cfg.spectral_norm
           else (lambda p: p))    # SN-GAN: normalize at every D evaluation

    def _mb_feat(pred_block, valid_):
        """Per-block minibatch-stddev scalar (None when the flag is off).
        Computed on the tensors D actually sees (instance noise included),
        masked, psum-global under the mesh axis."""
        if not cfg.mb_std:
            return None
        return mb_std_feature(pred_block, valid_, axis_name)

    def _d_loss_parts(d_params, obsv_4d_, pred_hat_, pred_4d_, noise_,
                      valid_, zeros_, ones_, w_label=1.0, w_rest=1.0):
        nn = obsv_4d_.shape[0]
        dp = cast(_sn(d_params))
        obsv_code = encode_obsv(dp, cast(obsv_4d_), cfg.remat_steps)
        extra = None
        if cfg.mb_std:
            # one statistic per provenance block — fake and real separately
            # (a shared statistic would be identical across the halves and
            # carry no real/fake signal)
            extra = jnp.concatenate([_mb_feat(pred_hat_, valid_),
                                     _mb_feat(pred_4d_, valid_)], axis=0)
        labels, codes = discriminator_heads(
            dp, obsv_code,
            cast(jnp.concatenate([pred_hat_, pred_4d_], axis=0)), cfg.pac,
            extra)
        labels, codes = labels.astype(dtype), codes.astype(dtype)
        # pac > 1: one label per pack — the fake block is the first
        # nn/pac labels (nn % pac == 0, so no pack straddles the boundary)
        np_ = nn // cfg.pac
        fake_label, real_label = labels[:np_], labels[np_:]
        fake_code = codes[:nn]
        gv = group_valid(valid_)
        loss = lsgan_d_loss(fake_label, real_label, fake_code, noise_,
                            valid_, zeros_, ones_, cfg.use_info_loss,
                            info_w, cfg.n_latent_codes,
                            cfg.latent_code_type, label_valid=gv,
                            w_label=w_label, w_info=w_rest)
        if cfg.r1_gamma > 0:
            # R1: penalize ‖∇_pred D(obsv, pred_real)‖² (second-order grads
            # flow through this when the loss is differentiated)
            def real_label_sum(p4):
                lbl, _ = discriminator_heads(dp, obsv_code, cast(p4),
                                             cfg.pac, _mb_feat(p4, valid_))
                return jnp.sum(lbl.astype(dtype) * gv[:, None])
            g_real = jax.grad(real_label_sum)(pred_4d_)
            per = jnp.sum(g_real.reshape(nn, -1) ** 2, axis=-1)
            r1 = jnp.sum(jnp.where(valid_, per, 0.0)) / jnp.maximum(
                jnp.sum(valid_), 1)
            loss = loss + w_rest * 0.5 * cfg.r1_gamma * r1
        return _shard_weight(loss)

    def d_loss_fn(d_params):
        return _d_loss_parts(d_params, obsv_4d, pred_hat_4d_d, pred_4d_d,
                             noise, valid, zeros_t, ones_t)

    def _d_chunk_loss(d_params, cb, ws, wp):
        return _d_loss_parts(d_params, cb["obsv_4d"], cb["pred_hat"],
                             cb["pred_4d"], cb["noise"], cb["valid"],
                             cb["zeros"], cb["ones"],
                             w_label=wp, w_rest=ws)

    if accum:
        def d_value_and_grad(d_params):
            return _accum_value_and_grad(_d_chunk_loss, d_params)

        def d_loss_value(d_params):
            def body(c, xs):
                cb, ws, wp = xs
                return c + _d_chunk_loss(d_params, cb, ws, wp), None
            loss, _ = jax.lax.scan(body, jnp.zeros((), dtype),
                                   (mb, chunk_w, pack_w))
            return loss
    else:
        d_value_and_grad = jax.value_and_grad(d_loss_fn)
        d_loss_value = d_loss_fn

    def d_phase(_):
        d_params, d_opt = state.d_params, state.d_opt
        d_backup = state.d_params
        d_loss_first = jnp.zeros((), obsv.dtype)
        for u in range(cfg.n_unrolling_steps + 1):
            d_loss_u, d_grads = d_value_and_grad(d_params)
            d_grads = _sync_grads(d_grads)
            updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)
            if u == 0:
                d_loss_first = d_loss_u
                if cfg.n_unrolling_steps > 0:
                    d_backup = d_params  # snapshot after the first update
        return d_params, d_opt, d_backup, d_loss_first

    ratio_scheduled = (cfg.d_update_every_end > 0
                       and cfg.d_update_every_switch > 0
                       and cfg.d_update_every_end != cfg.d_update_every)
    if cfg.d_update_every > 1 or ratio_scheduled:
        # D/G update-ratio schedule: on steps where step % every != 0 the
        # whole D phase is SKIPPED (lax.cond — the grad+Adam work is not
        # executed, not just discarded): D params/optimizer keep their old
        # values, the G phase below trains against the CURRENT D (no
        # unroll lookahead), and the metric reports the forward-only
        # d_loss of the current D.  With the warmup-style schedule the
        # ratio switches from d_update_every to d_update_every_end after
        # d_update_every_switch G steps.
        step = _g_step_count(state.g_opt)
        if ratio_scheduled:
            every = jnp.where(step < cfg.d_update_every_switch,
                              cfg.d_update_every, cfg.d_update_every_end)
        else:
            every = cfg.d_update_every
        do_d = (step % every) == 0
        d_params, d_opt, d_backup, d_loss_first = jax.lax.cond(
            do_d, d_phase,
            lambda _: (state.d_params, state.d_opt, state.d_params,
                       d_loss_value(state.d_params)),
            operand=None)
    else:
        d_params, d_opt, d_backup, d_loss_first = d_phase(None)
    if cfg.n_unrolling_steps == 0:
        d_backup = None

    # ---------------- G phase against the unrolled D -----------------------
    d_params_g = _sn(d_params)   # fixed through the G phase: normalize once

    def g_head_loss(pred_hat_4d, g_params):
        """G loss as a function of the rollout output (and, for the
        variety path only, of g_params through extra rollouts)."""
        ph_in = (pred_hat_4d if eps_g is None
                 else pred_hat_4d + sigma * eps_g)
        gen_label, gen_code = discriminator_apply(cast(d_params_g),
                                                  cast(obsv_4d),
                                                  cast(ph_in),
                                                  cfg.remat_steps, cfg.pac,
                                                  _mb_feat(ph_in, valid))
        gen_label = gen_label.astype(dtype)
        gen_code = gen_code.astype(dtype)
        loss = lsgan_g_loss(gen_label, gen_code, noise, valid, ones_t,
                            cfg.use_info_loss, info_w,
                            cfg.n_latent_codes, cfg.latent_code_type,
                            label_valid=group_valid(valid))
        if cfg.use_l2_loss:
            loss = loss + cfg.loss_l2_w * l2_traj_loss(
                pred_hat_4d[..., :2], pred, valid)
        if cfg.use_variety_loss:
            ks = jax.random.split(k_var, cfg.variety_k)
            pred_k = jax.vmap(lambda kk: rollout(
                g_params, draw_noise(kk)))(ks)
            loss = loss + cfg.loss_l2_w * variety_loss(
                pred_k[..., :2], pred, valid)
        if cfg.ms_weight > 0 or cfg.ds_weight > 0:
            # Diversity regularizers over K−1 EXTRA rollouts from
            # independent noise draws (shared between both forms): the
            # global-ratio mode-seeking term (config.ms_weight) and the
            # per-sample diversity hinge (config.ds_weight); d_i/dz_i are
            # means over all K(K−1)/2 pairs (config.ds_k).  Fresh keys
            # derive via fold_in(rng, 17+j) so existing noise streams are
            # untouched, and each draw goes through draw_noise's
            # global-draw-and-slice for exact DP stream parity.
            k_extra = max(1, cfg.ds_k - 1)
            z_x = jnp.stack([draw_noise(jax.random.fold_in(rng, 17 + j))
                             for j in range(k_extra)])
            pred_x = jax.vmap(lambda z: rollout(g_params, z))(z_x)
            z_all = jnp.concatenate([noise[None], z_x], axis=0)
            p_all = jnp.concatenate([pred_hat_4d[None, ..., :2],
                                     pred_x[..., :2]], axis=0)

            def _pair_mean(t):
                """[K, n, ...] → per-row mean |t_a − t_b| over all pairs."""
                k = t.shape[0]
                acc = 0.0
                for a in range(k):
                    for b in range(a + 1, k):
                        acc = acc + jnp.mean(
                            jnp.abs(t[a] - t[b]).reshape(n, -1), axis=-1)
                return acc / (k * (k - 1) // 2)

            d_row = _pair_mean(p_all)
            dz_row = _pair_mean(z_all)

            def _masked_mean(per, psum):
                s = jnp.sum(jnp.where(valid, per, 0.0))
                c = jnp.sum(valid).astype(dtype)
                if psum and axis_name is not None:
                    s = jax.lax.psum(s, axis_name)
                    c = jax.lax.psum(c, axis_name)
                return s / jnp.maximum(c, 1.0)

            if cfg.ms_weight > 0:
                # global ratio: masked means are psum-global under DP
                # (with the matching _shard_weight form), so the sharded
                # step equals the single-device one
                ratio = (_masked_mean(d_row, psum=True)
                         / (_masked_mean(dz_row, psum=True) + 1e-8))
                loss = loss + cfg.ms_weight / (ratio + 1e-5)
            if cfg.ds_weight > 0:
                # per-sample hinge: psum-global masked mean (with the
                # matching _shard_weight form) so both the loss metric and
                # the gradient equal the single-device big-batch step
                # exactly, whatever the per-shard padding
                hinge = jnp.maximum(
                    0.0, cfg.ds_tau - d_row / (dz_row + 1e-8))
                loss = loss + cfg.ds_weight * _masked_mean(hinge,
                                                           psum=True)
        return _shard_weight(loss)

    if accum:
        def _g_chunk_loss(g_params, cb, ws, wp):
            ph = rollout_on(g_params, cb["obsv"], cb["noise"],
                            cb["scene_ids"], cb.get("social_x4"))
            ph_in = ph if eps_g is None else ph + sigma * cb["eps_g"]
            gen_label, gen_code = discriminator_apply(
                cast(d_params_g), cast(cb["obsv_4d"]), cast(ph_in),
                cfg.remat_steps, cfg.pac, _mb_feat(ph_in, cb["valid"]))
            loss = lsgan_g_loss(gen_label.astype(dtype),
                                gen_code.astype(dtype), cb["noise"],
                                cb["valid"], cb["ones"], cfg.use_info_loss,
                                info_w, cfg.n_latent_codes,
                                cfg.latent_code_type,
                                label_valid=group_valid(cb["valid"]),
                                w_label=wp, w_info=ws)
            if cfg.use_l2_loss:
                loss = loss + ws * cfg.loss_l2_w * l2_traj_loss(
                    ph[..., :2], cb["pred"], cb["valid"])
            return _shard_weight(loss)

        g_loss, g_grads = _accum_value_and_grad(_g_chunk_loss,
                                                state.g_params)
        pred_hat_4d = pred_hat_fwd
    elif rollout_vjp is not None:
        # d(loss)/d(pred_hat) through the D heads, then pull back through
        # the saved rollout — chain rule split, bit-for-math-equal to
        # differentiating the recomputed composite
        g_loss, d_pred_hat = jax.value_and_grad(
            lambda ph: g_head_loss(ph, state.g_params))(pred_hat_fwd)
        (g_grads,) = rollout_vjp(d_pred_hat)
        pred_hat_4d = pred_hat_fwd
    else:
        def g_loss_fn(g_params):
            pred_hat_4d = rollout(g_params, noise)
            return g_head_loss(pred_hat_4d, g_params), pred_hat_4d
        (g_loss, pred_hat_4d), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
    g_grads = _sync_grads(g_grads)
    g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)

    if cfg.g_ema_decay > 0:
        dd = cfg.g_ema_decay
        g_ema = jax.tree_util.tree_map(
            lambda e, p: dd * e + (1.0 - dd) * p, state.g_ema, g_params)
    else:
        g_ema = state.g_ema

    # ---------------- restore D (unrolled-GAN bookkeeping) -----------------
    if cfg.n_unrolling_steps > 0 and d_backup is not None:
        if cfg.d_restore == "full":
            d_params = d_backup
        elif cfg.d_restore == "reference":
            d_params = restore_linear_only(d_backup, d_params)
        # "none": keep the unrolled D

    # ---------------- metrics (train.py:546-551) ---------------------------
    err = traj_errors(pred_hat_4d[..., :2], pred)          # [N, T]
    err = jnp.where(valid[:, None], err, 0.0)
    metrics = StepMetrics(
        d_loss=d_loss_first,
        g_loss=g_loss,
        ade_sum=jnp.sum(err) / cfg.n_next,
        fde_sum=jnp.sum(err[:, -1]),
        n_samples=jnp.sum(valid).astype(jnp.int32),
    )
    new_state = TrainState(g_params, d_params, g_opt, d_opt, g_ema)

    # fully-padded chunks (mesh-divisibility filler) must be no-ops
    any_valid = jnp.any(valid)
    if axis_name is not None:
        if _w_shard is not None:
            # losses already carry the valid-count share — plain pmean IS
            # the global masked mean
            _loss_mean = functools.partial(jax.lax.pmean,
                                           axis_name=axis_name)
        else:
            # count-weighted global mean: a fully-padded filler shard
            # (mesh-divisibility padding; masked loss exactly 0) must not
            # dilute the reported losses, and unevenly-padded shards must
            # weight by their true sample share — this equals the
            # single-device masked mean over the global batch
            _cnt_m = jnp.sum(valid).astype(obsv.dtype)
            _tot_m = jnp.maximum(jax.lax.psum(_cnt_m, axis_name), 1.0)

            def _loss_mean(x):
                return jax.lax.psum(x * _cnt_m, axis_name) / _tot_m
        metrics = StepMetrics(
            d_loss=_loss_mean(metrics.d_loss),
            g_loss=_loss_mean(metrics.g_loss),
            ade_sum=jax.lax.psum(metrics.ade_sum, axis_name),
            fde_sum=jax.lax.psum(metrics.fde_sum, axis_name),
            n_samples=jax.lax.psum(metrics.n_samples, axis_name),
        )
        # with pmean'd grads every shard computes identical updates; a chunk
        # is a no-op only if ALL shards are padding
        any_valid = jnp.any(
            jax.lax.all_gather(any_valid, axis_name))
    new_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(any_valid, new, old), new_state, state)
    return new_state, metrics
