"""ETH/UCY leave-one-scene-out benchmark runner (BASELINE.json config 3).

The reference script trains one hard-coded dataset with an in-file 4/5
split (train.py:56,95-98); the paper's protocol is leave-one-scene-out over
{eth, hotel, univ, zara1, zara2}.  This module implements the full
protocol: for each held-out scene, train on the concatenation of the other
scenes' windows and report avg / min-of-K ADE/FDE on the held-out scene in
meters.

Scene npz files follow the standard ``{obsvs, preds, times, batches}``
schema (produced by ``cli create-dataset`` from the obsmat files).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from socialways_tpu.config import TrainConfig
from socialways_tpu.data.dataset import TrajectoryDataset
from socialways_tpu.data.scale import Scale
from socialways_tpu.engine.trainer import Trainer

SCENES = ("eth", "hotel", "univ", "zara1", "zara2")


def _load_raw(path: str):
    d = np.load(path)
    return (np.array(d["obsvs"], np.float32), np.array(d["preds"],
                                                       np.float32),
            np.array(d["times"]), np.array(d["batches"], np.int64))


def merge_scenes(files_train: Sequence[str], file_test: str
                 ) -> TrajectoryDataset:
    """Concatenate training scenes' windows, append the held-out scene as
    the test portion, fit one keep-ratio Scale over everything and
    normalize (the reference's global-min/max normalization, train.py:113-120,
    extended to the multi-scene protocol)."""
    obs_parts, pred_parts, time_parts, batch_parts = [], [], [], []
    offset = 0
    for f in list(files_train) + [file_test]:
        o, p, t, b = _load_raw(f)
        obs_parts.append(o)
        pred_parts.append(p)
        time_parts.append(t)
        batch_parts.append(b + offset)
        offset += o.shape[0]

    obsvs = np.concatenate(obs_parts)
    preds = np.concatenate(pred_parts)
    times = np.concatenate(time_parts)
    batches = np.concatenate(batch_parts)
    train_size = sum(len(b) for b in batch_parts[:-1])

    scale = Scale()
    scale.fit(obsvs.reshape(-1, 2)).fit(preds.reshape(-1, 2))
    scale.calc_scale(keep_ratio=True)
    obsvs = scale.normalize(obsvs)
    preds = scale.normalize(preds)

    return TrajectoryDataset(obsvs=obsvs, preds=preds, times=times,
                             batches=batches, scale=scale,
                             train_size=train_size)


def run_leave_one_out(
    data_dir: str,
    cfg: TrainConfig,
    scenes: Sequence[str] = SCENES,
    n_epochs: Optional[int] = None,
    fused_block: int = 10,
    verbose: bool = True,
) -> Dict[str, Dict[str, float]]:
    """Train + evaluate each leave-one-out fold.  Returns
    {scene: {ade_min, fde_min, ade_avg, fde_avg, train_time_s}}."""
    n_epochs = n_epochs or cfg.n_epochs
    files = {s: os.path.join(data_dir, f"{s}-{cfg.n_past}-{cfg.n_next}.npz")
             for s in scenes}
    missing = [f for f in files.values() if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"missing scene files: {missing} — create them with "
            "`cli create-dataset <obsmat> <out.npz>`")

    results: Dict[str, Dict[str, float]] = {}
    for held_out in scenes:
        ds = merge_scenes([files[s] for s in scenes if s != held_out],
                          files[held_out])
        trainer = Trainer(cfg, ds)
        state = trainer.init_state()
        rng = jax.random.PRNGKey(cfg.seed)

        tic = time.perf_counter()
        done = 0
        while done < n_epochs:
            block = min(fused_block, n_epochs - done)
            rng, sub = jax.random.split(rng)
            if block > 1:
                state, m = trainer.train_epochs(state, sub, block)
            else:
                state, m = trainer.train_epoch(state, sub)
            done += block
            if verbose and (done % max(fused_block * 5, 1) == 0
                            or done == n_epochs):
                print(f"  [{held_out}] epoch {done}/{n_epochs} "
                      f"train ADE={m['train_ade']:.3f}")
        train_time = time.perf_counter() - tic

        rng, sub = jax.random.split(rng)
        ev = trainer.evaluate(state, sub)
        ev["train_time_s"] = train_time
        results[held_out] = ev
        if verbose:
            print(f"{held_out}: ADE/FDE (min-{cfg.n_gen_samples}) = "
                  f"{ev['ade_min']:.3f}/{ev['fde_min']:.3f} | avg = "
                  f"{ev['ade_avg']:.3f}/{ev['fde_avg']:.3f} "
                  f"({train_time:.0f}s train)")

    if verbose and results:
        avg_ade = np.mean([r["ade_min"] for r in results.values()])
        avg_fde = np.mean([r["fde_min"] for r in results.values()])
        print(f"AVG: ADE/FDE (min-{cfg.n_gen_samples}) = "
              f"{avg_ade:.3f}/{avg_fde:.3f}")
    return results
