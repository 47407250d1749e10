"""Epoch-on-device trainer.

The reference's epoch is a Python loop of eager ops over ragged chunks
(train.py:446-554); dispatch overhead dominates at this model size.  Here an
entire epoch is ONE device program: packed chunks live on device as
[n_chunks, width, ...] arrays and ``lax.scan`` drives the GAN step over the
chunk axis, so the host touches the device once per epoch.

A host-side per-chunk loop (``epoch_on_device=False``) is kept for debugging.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from socialways_tpu.config import TrainConfig
from socialways_tpu.data.dataset import (
    PackedBatches,
    TrajectoryDataset,
    pack_scene_batches,
)
from socialways_tpu.engine.train_step import (
    StepMetrics,
    TrainState,
    eval_params,
    gan_step,
    init_train_state,
)
from socialways_tpu.eval.metrics import EvalSums, eval_chunk, finalize_eval


def _packed_to_device(packed: PackedBatches) -> Dict[str, jnp.ndarray]:
    return {
        "obsvs": jnp.asarray(packed.obsvs),
        "preds": jnp.asarray(packed.preds),
        "scene_ids": jnp.asarray(packed.scene_ids),
        "valid": jnp.asarray(packed.valid),
    }


def _chunk(batches: Dict[str, jnp.ndarray], i) -> Dict[str, jnp.ndarray]:
    return {k: v[i] for k, v in batches.items()}


def _check_grad_accum_alignment(packed: PackedBatches, grad_accum: int,
                                use_social: bool) -> None:
    """Validate config.grad_accum's contract on concrete packed data:
    chunk width divides evenly, and (social only — the one case where
    rows interact) no scene crosses a micro-chunk boundary.  Host-side
    numpy on the pack-time ids; gan_step itself cannot check traced
    values."""
    width = packed.scene_ids.shape[1]
    if width % grad_accum:
        raise ValueError(
            f"packed chunk width {width} is not divisible by "
            f"grad_accum={grad_accum}; pick a divisor of the width "
            "(= max(batch_size, largest scene group))")
    if not use_social:
        return
    sub = width // grad_accum
    for b in range(sub, width, sub):
        left, right = packed.scene_ids[:, b - 1], packed.scene_ids[:, b]
        bad = (left == right) & (right != -1)
        if bad.any():
            ci = int(np.argmax(bad))
            raise ValueError(
                f"grad_accum={grad_accum} splits scene "
                f"{int(right[ci])} of packed chunk {ci} at row {b}: "
                "social attention must not cross micro-chunk boundaries "
                "(re-pack with scene-aligned widths or use a smaller "
                "grad_accum)")


class Trainer:
    """Owns packed train/test data on device plus the compiled programs.

    With ``mesh`` (a 1-D ``data`` mesh from ``parallel.make_mesh``) the
    SAME production modes run data-parallel: packed chunks are grouped
    across devices (``shard_packed_for_mesh``) and the epoch/epochs scans
    run inside ``shard_map`` with per-step gradient pmean over ICI.  The
    noise stream is the single-device one (each shard slices its rows of
    the global draw), so mesh training matches single-device big-batch
    training up to float reassociation."""

    def __init__(self, cfg: TrainConfig, dataset: TrajectoryDataset,
                 pad_chunks_to: Optional[int] = None, mesh=None):
        self.cfg = cfg.replace(n_past=dataset.n_past, n_next=dataset.n_next)
        self.dataset = dataset
        self.mesh = mesh

        nt = dataset.n_train_samples
        self.train_packed = pack_scene_batches(
            dataset.obsvs[:nt], dataset.preds[:nt], dataset.train_batches,
            cfg.batch_size, pad_chunks_to=pad_chunks_to)
        if cfg.grad_accum > 1:
            _check_grad_accum_alignment(self.train_packed, cfg.grad_accum,
                                        cfg.use_social)
        if len(dataset.test_batches):
            test_batches = dataset.test_batches - dataset.test_batches[0][0]
            self.test_packed = pack_scene_batches(
                dataset.obsvs[nt:], dataset.preds[nt:], test_batches,
                cfg.batch_size, pad_chunks_to=pad_chunks_to)
        else:
            self.test_packed = None

        if mesh is None:
            self._train_dev = _packed_to_device(self.train_packed)
            self._test_dev = (_packed_to_device(self.test_packed)
                              if self.test_packed else None)
        else:
            from socialways_tpu.parallel.mesh import (
                make_dp_epoch_fn, make_dp_epochs_fn, make_dp_eval_chunk,
                make_dp_train_step, shard_packed_for_mesh)
            self._train_dev = shard_packed_for_mesh(self.train_packed, mesh)
            self._test_dev = (
                shard_packed_for_mesh(self.test_packed, mesh)
                if self.test_packed else None)

        if self.cfg.d_input_noise_steps < 0:
            # -1 = anneal over the whole planned run.  The sigma schedule
            # is keyed on OPTIMIZER steps, and on a mesh each epoch
            # performs only n_steps_per_epoch synchronized DP steps
            # (~n_chunks/N) — counting raw chunks would leave sigma at
            # ~(1-1/N)·sigma0 at run end.  Resolved HERE so every driver
            # (cli train, benchmarks, EnsembleTrainer, eth-ucy) honors
            # the sentinel identically.
            self.cfg = self.cfg.replace(
                d_input_noise_steps=cfg.n_epochs * self.n_steps_per_epoch)

        cfg_static = self.cfg
        if mesh is None:
            self._step = jax.jit(
                functools.partial(gan_step, cfg=cfg_static))
            self._epoch = jax.jit(self._epoch_fn)
            self._epochs = jax.jit(self._epochs_fn, static_argnames=("n",))
            self._eval_chunk = jax.jit(
                functools.partial(eval_chunk, cfg=cfg_static),
                static_argnames=("k",))
        else:
            self._step = make_dp_train_step(cfg_static, mesh)
            self._mesh_epoch, _ = make_dp_epoch_fn(cfg_static, mesh)
            self._mesh_epochs = make_dp_epochs_fn(cfg_static, mesh)
            self._dp_eval = {}      # k -> compiled dp eval program
            self._make_dp_eval = functools.partial(
                make_dp_eval_chunk, cfg_static, mesh)

    @property
    def n_steps_per_epoch(self) -> int:
        """Number of optimizer steps one epoch performs (chunk groups on a
        mesh — each group is ONE synchronized DP step — else chunks)."""
        if self.mesh is None:
            return self.train_packed.n_chunks
        return self._train_dev["obsvs"].shape[0]

    # ------------------------------------------------------------- init
    def init_state(self, seed: Optional[int] = None) -> TrainState:
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        return init_train_state(key, self.cfg)

    # ------------------------------------------------------------ train
    def _epoch_fn(self, state: TrainState, batches: Dict[str, jnp.ndarray],
                  rng: jax.Array) -> Tuple[TrainState, StepMetrics]:
        n_chunks = batches["obsvs"].shape[0]
        keys = jax.random.split(rng, n_chunks)

        def body(carry, xs):
            chunk, key = xs
            new_state, metrics = gan_step(carry, chunk, key, self.cfg)
            return new_state, metrics

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        summed = StepMetrics(
            d_loss=jnp.mean(metrics.d_loss),
            g_loss=jnp.mean(metrics.g_loss),
            ade_sum=jnp.sum(metrics.ade_sum),
            fde_sum=jnp.sum(metrics.fde_sum),
            n_samples=jnp.sum(metrics.n_samples),
        )
        return state, summed

    def _epochs_fn(self, state: TrainState, rng: jax.Array, n: int
                   ) -> Tuple[TrainState, StepMetrics]:
        """``n`` epochs as ONE device program (scan over epochs of the scan
        over chunks) — zero host round-trips inside the block."""
        keys = jax.random.split(rng, n)

        def body(carry, key):
            new_state, m = self._epoch_fn(carry, self._train_dev, key)
            return new_state, m

        state, ms = jax.lax.scan(body, state, keys)
        last = jax.tree_util.tree_map(lambda x: x[-1], ms)
        return state, last

    def train_epochs(self, state: TrainState, rng: jax.Array, n: int
                     ) -> Tuple[TrainState, Dict[str, float]]:
        """Run ``n`` epochs fused on device; returns the LAST epoch's
        metrics (matching what the per-epoch path would print last)."""
        tic = time.perf_counter()
        if self.mesh is None:
            state, m = self._epochs(state, rng, n=n)
        else:
            state, m = self._mesh_epochs(state, self._train_dev, rng, n=n)
        n_samp = max(int(m.n_samples), 1)
        d_loss, g_loss = float(m.d_loss), float(m.g_loss)
        ade_sum, fde_sum = float(m.ade_sum), float(m.fde_sum)
        toc = time.perf_counter()
        ss = self.dataset.ss
        return state, {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "train_ade": ade_sum / ss / n_samp,
            "train_fde": fde_sum / ss / n_samp,
            "epoch_time_s": (toc - tic) / n,
            "steps": self.n_steps_per_epoch * n,
        }

    def train_epoch(self, state: TrainState, rng: jax.Array
                    ) -> Tuple[TrainState, Dict[str, float]]:
        tic = time.perf_counter()
        if self.cfg.epoch_on_device:
            if self.mesh is None:
                state, m = self._epoch(state, self._train_dev, rng)
            else:
                state, m = self._mesh_epoch(state, self._train_dev, rng)
        else:
            n_chunks = self.n_steps_per_epoch
            keys = jax.random.split(rng, n_chunks)
            sums = None
            for i in range(n_chunks):
                state, m_i = self._step(state, _chunk(self._train_dev, i),
                                        keys[i])
                sums = m_i if sums is None else StepMetrics(
                    d_loss=sums.d_loss + m_i.d_loss,
                    g_loss=sums.g_loss + m_i.g_loss,
                    ade_sum=sums.ade_sum + m_i.ade_sum,
                    fde_sum=sums.fde_sum + m_i.fde_sum,
                    n_samples=sums.n_samples + m_i.n_samples,
                )
            # losses report the per-chunk MEAN, matching the on-device
            # path (_epoch_fn's jnp.mean) — the debug path must not print
            # n_chunks-times-larger losses for the same run
            m = sums._replace(d_loss=sums.d_loss / n_chunks,
                              g_loss=sums.g_loss / n_chunks)
        # host transfers force true completion (on remote-tunnel platforms
        # like axon, block_until_ready may return early)
        n = max(int(m.n_samples), 1)
        d_loss, g_loss = float(m.d_loss), float(m.g_loss)
        ade_sum, fde_sum = float(m.ade_sum), float(m.fde_sum)
        toc = time.perf_counter()

        ss = self.dataset.ss
        return state, {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "train_ade": ade_sum / ss / n,
            "train_fde": fde_sum / ss / n,
            "epoch_time_s": toc - tic,
            "steps": self.n_steps_per_epoch,
        }

    # ------------------------------------------------------------- eval
    def evaluate(self, state: TrainState, rng: jax.Array,
                 n_gen_samples: Optional[int] = None) -> Dict[str, float]:
        if self._test_dev is None:
            return {}
        k = n_gen_samples or self.cfg.n_gen_samples
        if self.mesh is None:
            eval_fn = functools.partial(self._eval_chunk, k=k)
            n_chunks = self.test_packed.n_chunks
        else:
            if k not in self._dp_eval:
                self._dp_eval[k] = self._make_dp_eval(k=k)
            eval_fn = self._dp_eval[k]
            n_chunks = self._test_dev["obsvs"].shape[0]
        keys = jax.random.split(rng, n_chunks)
        total = None
        for i in range(n_chunks):
            s = eval_fn(eval_params(state), _chunk(self._test_dev, i),
                        keys[i])
            total = s if total is None else EvalSums(
                *(a + b for a, b in zip(total, s)))
        return finalize_eval(total, self.dataset.ss,
                             self.dataset.n_test_samples)
