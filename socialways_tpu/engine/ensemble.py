"""Multi-seed ensemble training: N independent GAN replicas as ONE device
program.

Seed-robustness protocols (BASELINE.md's coverage sweeps) train the same
recipe under several seeds and score each final model.  Run serially that
costs N full runs of wall clock; on TPU the model is tiny (h=64) and each
replica leaves most of the chip idle — so instead ``vmap`` the fused-epoch
training over a stacked member axis: every LSTM/decode matmul becomes a
batched matmul and N seeds train for roughly the wall cost of one.

Member independence is exact: each member carries its own params, optimizer
state and PRNG stream (``PRNGKey(seed_m)`` — the same derivation a solo
``Trainer`` run with that seed uses), and ``vmap`` batches the math without
mixing members, so member ``i`` of the ensemble equals the solo run up to
float reassociation (tested in tests/test_engine.py).

The reference has no counterpart (single seed, single process; SURVEY §2.3)
— this is a TPU-native addition in the spirit of its K-sample
"ensemble-parallel" row.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from socialways_tpu.engine.train_step import TrainState, eval_params
from socialways_tpu.engine.trainer import Trainer
from socialways_tpu.eval.metrics import EvalSums, finalize_eval


def stack_states(states: Sequence[TrainState]) -> TrainState:
    """Stack per-member TrainStates leaf-wise into one pytree with a
    leading member axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def member_state(stacked: TrainState, i: int) -> TrainState:
    """Extract member ``i``'s TrainState (e.g. to checkpoint the winner)."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


class EnsembleTrainer:
    """Wraps a single-device :class:`Trainer` (its packed data and config)
    and trains N members jointly via ``vmap`` over the member axis.

    With ``mesh`` the member axis is additionally SHARDED over the mesh
    devices (``shard_map`` around the vmapped program; data replicated):
    members are embarrassingly parallel, so each device trains N/M members
    with zero collectives — N-seed robustness protocols at M× the
    throughput of the single-chip ensemble.  Member math is unchanged
    (same per-member keys), so member ``i`` still equals the solo run."""

    def __init__(self, trainer: Trainer, mesh=None):
        if trainer.mesh is not None:
            raise ValueError("EnsembleTrainer wraps a SINGLE-DEVICE "
                             "trainer; pass mesh= to EnsembleTrainer to "
                             "shard the member axis instead")
        self.trainer = trainer
        self.cfg = trainer.cfg
        self.mesh = mesh
        self._epochs_v = {}           # n -> compiled vmapped epochs fn
        self._eval_v = {}             # k -> compiled vmapped eval chunk

    # ------------------------------------------------------- mesh helpers
    @property
    def _n_shards(self) -> int:
        return 1 if self.mesh is None else self.mesh.size

    def _check_members(self, n_members: int) -> None:
        if n_members % self._n_shards:
            raise ValueError(
                f"{n_members} ensemble members not divisible by the "
                f"{self._n_shards}-device mesh")

    def _member_sharded(self, fn, n_replicated: int):
        """Wrap a vmapped-over-members ``fn(members…, replicated…)`` so the
        member axis shards over every mesh axis; the trailing
        ``n_replicated`` args (packed data) are replicated."""
        if self.mesh is None:
            return fn
        from jax.sharding import PartitionSpec as P
        m_spec = P(self.mesh.axis_names)
        # check_vma off: members are independent (no collectives), and the
        # rollout scan's zeros-initialized LSTM carry is unvarying at entry
        # which the varying-manual-axes analysis would reject
        return jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(m_spec, m_spec) + (P(),) * n_replicated,
            out_specs=m_spec, check_vma=False)

    # ------------------------------------------------------------- init
    def init_states(self, seeds: Sequence[int]) -> TrainState:
        self._check_members(len(seeds))
        return stack_states([self.trainer.init_state(s) for s in seeds])

    # ------------------------------------------------------------ train
    def train_epochs(self, states: TrainState, rngs: jax.Array, n: int
                     ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """``n`` fused epochs for every member; ``rngs`` is [N, 2] (one key
        per member).  Returns stacked states and per-member metric arrays
        (last epoch's, matching Trainer.train_epochs semantics)."""
        self._check_members(rngs.shape[0])
        if n not in self._epochs_v:
            def epochs_one(state, rng, batches):
                keys = jax.random.split(rng, n)

                def body(carry, key):
                    return self.trainer._epoch_fn(carry, batches, key)

                state, ms = jax.lax.scan(body, state, keys)
                return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

            fn = jax.vmap(epochs_one, in_axes=(0, 0, None))
            self._epochs_v[n] = jax.jit(
                self._member_sharded(fn, n_replicated=1))
        states, m = self._epochs_v[n](states, rngs,
                                      self.trainer._train_dev)
        ss = self.trainer.dataset.ss
        n_samp = jnp.maximum(m.n_samples, 1)
        return states, {
            "d_loss": m.d_loss,
            "g_loss": m.g_loss,
            "train_ade": m.ade_sum / ss / n_samp,
            "train_fde": m.fde_sum / ss / n_samp,
        }

    # ------------------------------------------------------------- eval
    def evaluate(self, states: TrainState, rngs: jax.Array,
                 n_gen_samples: int | None = None) -> List[Dict[str, float]]:
        """Per-member K-sample eval over the test set; ``rngs`` [N, 2].
        Returns one metrics dict per member (same keys as
        Trainer.evaluate)."""
        tr = self.trainer
        if tr._test_dev is None:
            return []
        self._check_members(rngs.shape[0])
        k = n_gen_samples or self.cfg.n_gen_samples
        if k not in self._eval_v:
            fn = jax.vmap(lambda p, key, chunk: tr._eval_chunk(
                p, chunk, key, k=k), in_axes=(0, 0, None))
            self._eval_v[k] = jax.jit(
                self._member_sharded(fn, n_replicated=1))
        n_members = rngs.shape[0]
        n_chunks = tr.test_packed.n_chunks
        # one independent stream per member, split per chunk exactly like
        # the solo evaluate — ONE vmapped dispatch, not a host loop of
        # split ops (per-call host PRNG floods the axon tunnel)
        keys = jax.vmap(lambda r: jax.random.split(r, n_chunks))(rngs)
        total = None
        for i in range(n_chunks):
            chunk = {kk: v[i] for kk, v in tr._test_dev.items()}
            s = self._eval_v[k](eval_params(states), keys[:, i], chunk)
            total = s if total is None else EvalSums(
                *(a + b for a, b in zip(total, s)))
        out = []
        for m in range(n_members):
            sums = EvalSums(*(jnp.asarray(x)[m] for x in total))
            out.append(finalize_eval(sums, tr.dataset.ss,
                                     tr.dataset.n_test_samples))
        return out

    def coverage(self, states: TrainState, rngs: jax.Array,
                 n_samples: int = 64) -> List[float]:
        """Per-member toy mode coverage over (up to) the first
        ``n_samples`` test samples — the same protocol as ``cli train
        --track-coverage`` (fold_in 99, K = cfg.n_gen_samples)."""
        import numpy as np

        from socialways_tpu.eval.metrics import k_sample_rollout
        from socialways_tpu.eval.stats import toy_mode_coverage

        tr, ds, cfg = self.trainer, self.trainer.dataset, self.cfg
        self._check_members(rngs.shape[0])
        nt = ds.n_train_samples
        obs = jnp.asarray(ds.obsvs[nt:nt + n_samples])
        # real test scene structure (matters for use_social evals — a
        # zeros placeholder would pool one giant scene)
        ids = jnp.asarray(ds.scene_ids_for_rows(nt, obs.shape[0]))
        cache_key = ("cov", obs.shape[0])
        if cache_key not in self._eval_v:
            fn = jax.vmap(
                lambda p, key, ob: k_sample_rollout(
                    p, ob, ids, key,
                    cfg.n_gen_samples, cfg),
                in_axes=(0, 0, None))
            self._eval_v[cache_key] = jax.jit(
                self._member_sharded(fn, n_replicated=1))
        keys = jax.vmap(lambda r: jax.random.fold_in(r, 99))(rngs)
        pk = self._eval_v[cache_key](eval_params(states), keys, obs)
        obs_w = ds.scale.denormalize(np.asarray(obs))
        return [toy_mode_coverage(
                    obs_w, ds.scale.denormalize(np.asarray(pk[m, ..., :2])))
                for m in range(rngs.shape[0])]
