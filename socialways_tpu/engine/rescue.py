"""Eval-keyed stall detection + discriminator-reset rescue.

One shared implementation of the bookkeeping that previously lived in
three near-identical copies (``cli train``'s ``--ade-stall-recover``
loop, :func:`engine.ethucy.run_leave_one_out`, and the
``benchmarks/ethucy_timematched.py`` harness).  The mechanism itself is
the production ``--stall-reset-d`` move measured in BASELINE.md's r4k/
r4l rescue matrices: a GAN stuck in a bad-but-stable early equilibrium
(flat eval ADE, healthy-looking adversarial losses) is usually
metastable — restoring the best generator seen so far and giving it a
FRESH random discriminator kicks it into a better basin.

Two policy refinements, both measured in the r4k queue
(``benchmarks/tpu_runbook_r4k.log``):

* **grace** — after each rescue, G re-trains against the fresh random D
  and the eval ADE transiently DOUBLES for 1-2 eval blocks before
  recovering; counting those blocks as stalls re-fires the rescue
  mid-recovery.  ``grace`` skips stall counting for that many evals
  after each rescue.
* **ineffective-rescue cap** — consecutive rescues that find no new
  basin thrash the run (each costs a transient; univ/seed-3 in the r4k
  matrix fired 5 rescues and finished 2.4x worse than no-rescue).
  ``max_rescues`` stops rescuing once the *consecutive-ineffective*
  streak reaches that count.  A rescue is judged at the NEXT rescue's
  fire time: if no new global best (>2% better) appeared since the
  previous rescue, the streak grows, else it resets.  The first rescue
  is never counted — there is no prior rescue to judge — so up to
  ``max_rescues + 1`` rescues can execute in a single stall episode.

The reference has no failure-handling story at all (SURVEY §5.3); this
subsystem is TPU-framework-native.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from socialways_tpu.config import TrainConfig


class StallTracker:
    """Stall/rescue bookkeeping keyed on a monotone "lower is better"
    eval metric (eval ADE here; the toy coverage path keys on coverage
    and keeps its own simpler counter).

    Protocol, once per eval::

        if tracker.observe(ev["ade_min"]) and done < n_epochs:
            state = reinit_discriminator(best_state, cfg, key)
            streak = tracker.fired(best_ade, at_epoch=done)

    ``observe`` returns True when a rescue should fire now (patience
    exhausted, not in a post-rescue grace window, ineffective-streak
    cap not reached).  Callers keep their own end-of-run / checkpoint-
    exists guards.
    """

    def __init__(self, patience: int, grace: int = 0,
                 max_rescues: int = 0, improve: float = 0.98,
                 classify_patience: int = 0, classify_ratio: float = 3.0,
                 collapse_ratio: float = 1.2):
        self.patience = patience
        self.grace_n = grace
        self.max_rescues = max_rescues
        self.improve = improve
        # signature-matched EARLY trigger (r4m diagnosis → r5 lever):
        # the stalled folds are a broad-distribution under-fit
        # equilibrium with a signature the harness already logs per
        # eval — avg-of-K ≥ classify_ratio × min-of-K (samples stay
        # diverse) while train ADE tracks the eval avg (not overfit).
        # Healthy folds run avg/min ≈ 1.3-1.9 (stall_diagnosis_r4m:
        # 1.8 vs 3.3/4.1 stalled), so signature-matching stalls can
        # fire after only ``classify_patience`` flat evals instead of
        # the blunter ``patience``, cutting detection latency without
        # touching healthy folds.  0 = off (patience-only, the r4l
        # shipped policy).
        self.classify_patience = classify_patience
        self.classify_ratio = classify_ratio
        # second stall class, found by the round-5 out-of-sample seed
        # extension (seed 9 / eth, benchmarks/
        # tpu_runbook_r5_gated_ext.log): min-of-K ≈ avg-of-K ≈ const
        # for 25k epochs with D dominating (d_loss → 0.19) — the K=20
        # noise draws produce near-identical rollouts, i.e. DIVERSITY
        # COLLAPSE, the opposite tail from the under-fit signature and
        # invisible to it (avg/min ≈ 1.0 vs its ≥ 3.0 gate).  Healthy
        # folds never leave avg/min ≈ 1.3-3.4 on this protocol (the
        # post-EMA late-run floor is ≈ 2.4), so a stalled streak at
        # avg ≤ collapse_ratio × min is unambiguous.  Shares
        # ``classify_patience`` and the fresh-D rescue (D dominance is
        # exactly what a re-initialized D removes).
        self.collapse_ratio = collapse_ratio
        self.last_signature = ""      # "underfit" | "collapse" — which
                                      # signature the current streak hit
        self.bar = float("inf")
        self.stall = 0
        self.grace = 0
        self.ineffective = 0
        self.best_at_last_rescue = float("inf")
        self.rescues: List[int] = []
        self.signature_hits = 0       # consecutive signature-matching evals
        self.fired_early = 0          # EXECUTED rescues fired by the
                                      # classifier (counted in fired())
        self.last_trigger = ""        # "patience" | "classifier" — what
                                      # made the latest observe() True
        self._pending_early = False   # latest True came from the classifier

    def observe(self, ade: float, ade_avg: float | None = None,
                train_ade: float | None = None) -> bool:
        """Record one eval; True when a rescue should fire now.

        ``ade_avg``/``train_ade`` (both optional) feed the signature
        classifier (under-fit and diversity-collapse, see __init__);
        patience-only callers are unchanged.
        ``patience < 0`` (or 0 with ``classify_patience > 0``) =
        classify-ONLY (gated) mode: the tracker is armed but the blunt
        patience path never fires — the measured winner of the r5 gated
        A/B (false fires eliminated at zero loss; the s6/univ 0.193
        matrix cell was rescue-induced)."""
        if not self.patience and not self.classify_patience:
            return False
        if self.grace > 0:
            # post-rescue transient (G vs the fresh random D): these
            # evals neither count as stalls nor move the bar
            self.grace -= 1
            self.signature_hits = 0
            return False
        if ade < self.improve * self.bar:
            self.bar = ade
            self.stall = 0
            self.signature_hits = 0
        else:
            self.stall += 1
            # under-fit signature: diverse-but-inaccurate (avg >> min)
            # and NOT overfit (train tracks the eval avg) — the exact
            # ratios of benchmarks/stall_diagnosis_r4m.json
            underfit = (ade_avg is not None
                        and ade_avg >= self.classify_ratio * ade
                        and (train_ade is None
                             or train_ade > 0.5 * ade_avg))
            # diversity-collapse signature (r5 seed-9/eth): the K
            # samples are near-identical, so min-of-K ≈ avg-of-K —
            # healthy runs never stall at avg/min ≤ ~1.2 (see __init__)
            collapse = (ade_avg is not None
                        and ade_avg <= self.collapse_ratio * ade)
            if self.classify_patience and (underfit or collapse):
                self.signature_hits += 1
                self.last_signature = ("underfit" if underfit
                                       else "collapse")
            else:
                self.signature_hits = 0
        capped = (self.max_rescues
                  and self.ineffective >= self.max_rescues)
        if capped:
            return False
        if self.patience > 0 and self.stall >= self.patience:
            self.last_trigger, self._pending_early = "patience", False
            return True
        if (self.classify_patience
                and self.signature_hits >= self.classify_patience):
            self.last_trigger, self._pending_early = "classifier", True
            return True
        return False

    def fired(self, best_ade: float, at_epoch: int) -> int:
        """Record a rescue that just EXECUTED; returns the consecutive-
        ineffective streak (0 = the interval since the previous rescue
        produced a new global best).  ``fired_early`` counts executed
        classifier-triggered rescues here — not in observe(), whose
        True can still be suppressed by caller guards (e.g. the
        run-end ``done < n_epochs`` check)."""
        if self._pending_early:
            self.fired_early += 1
            self._pending_early = False
        if best_ade < self.best_at_last_rescue * self.improve:
            self.ineffective = 0      # the last rescue found a new
        else:                         # basin — reset the cap
            self.ineffective += 1
        self.best_at_last_rescue = best_ade
        self.rescues.append(at_epoch)
        self.stall = 0
        self.signature_hits = 0
        self.grace = self.grace_n
        self.bar = best_ade
        return self.ineffective


def reinit_discriminator(state, cfg: TrainConfig, key: jax.Array):
    """Fresh discriminator params + optimizer on ``key``; G/EMA and the
    G optimizer (with its schedule clock) are untouched.  The core of
    the ``--stall-reset-d`` rescue."""
    from socialways_tpu.engine.train_step import make_optimizers
    from socialways_tpu.models.discriminator import init_discriminator

    d_params = init_discriminator(key, cfg, jnp.dtype(cfg.dtype))
    _, d_tx = make_optimizers(cfg)
    return state._replace(d_params=d_params, d_opt=d_tx.init(d_params))


def jitter_generator(state, key: jax.Array, sigma: float):
    """Second rescue lever for folds where fresh-D alone converts only
    partially (r4l: s7/eth stuck at 0.166 after 3 rescues): perturb the
    RAW generator params with Gaussian noise scaled per leaf by the
    leaf's RMS (``w += sigma * rms(w) * N(0,1)``), so every layer moves
    the same relative amount regardless of its scale.

    Rationale: the rescue restores the SAME best G each time — with a
    fresh D it can slide straight back into the same metastable basin.
    A small relative jitter breaks the exact re-entry while staying
    close enough to keep the restored quality reachable.  The EMA
    params (what evaluation serves) and both optimizer states are
    untouched: serving stays at the restored best while training
    explores from the jittered point.  sigma=0 returns state unchanged.
    """
    if not sigma:
        return state
    leaves, treedef = jax.tree_util.tree_flatten(state.g_params)
    keys = jax.random.split(key, len(leaves))
    jittered = []
    for leaf, k in zip(leaves, keys):
        rms = jnp.sqrt(jnp.mean(jnp.square(leaf)) + 1e-12)
        jittered.append(leaf + sigma * rms
                        * jax.random.normal(k, leaf.shape, leaf.dtype))
    return state._replace(
        g_params=jax.tree_util.tree_unflatten(treedef, jittered))
