"""Generated-vs-real distribution metrics: 1-NN two-sample test and EMD.

Semantics parity with the reference ``calc_statistics.py:7-119``:

- ``compute_1nn``: mix K real and K fake trajectory sets per pedestrian,
  label them ±1, and measure leave-one-out 1-nearest-neighbor classification
  accuracy on the post-observation part (50% = indistinguishable — ideal);
- ``compute_wasserstein``: per pedestrian, Earth Mover's Distance between
  real and fake sample sets under mean-per-step Euclidean ground cost,
  solved with the Hungarian algorithm;
- ``calc_and_store_stats``: walk an epoch-dump tree (io.dumps schema),
  aggregate both metrics per epoch, cache to ``stats<K>.npz``.

The reference's O(K²·T) Python loops are replaced by vectorized NumPy
pairwise distance computation (host-side — these are offline analysis
metrics, not device code).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def _pairwise_traj_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a: [Ka, T, 2], b: [Kb, T, 2] → [Ka, Kb] mean-per-step Euclidean."""
    d = a[:, None] - b[None, :]                       # [Ka, Kb, T, 2]
    return np.sqrt((d ** 2).sum(-1)).mean(-1)


def compute_1nn(reals: np.ndarray, fakes: np.ndarray,
                obsv_len: int = 2) -> np.ndarray:
    """reals/fakes: [K, nPed, T, 2].  Returns
    [overall_acc, real_acc, fake_acc] (calc_statistics.py:7-45)."""
    n_reals, n_fakes = reals.shape[0], fakes.shape[0]
    n_mixed = n_reals + n_fakes
    n_ped = reals.shape[1]

    real_pos = real_neg = fake_pos = fake_neg = 0
    for kk in range(n_ped):
        mixed = np.concatenate([reals[:, kk, obsv_len:],
                                fakes[:, kk, obsv_len:]])
        d = _pairwise_traj_dist(mixed, mixed)
        np.fill_diagonal(d, np.inf)         # leave-one-out
        nn = np.argmin(d, axis=1)
        labels = np.array([1] * n_reals + [-1] * n_fakes)
        for i in range(n_mixed):
            if labels[i] == 1 and labels[nn[i]] == 1:
                real_pos += 1
            elif labels[i] == 1:
                real_neg += 1
            elif labels[i] == -1 and labels[nn[i]] == -1:
                fake_pos += 1
            else:
                fake_neg += 1
    return np.array([(real_pos + fake_pos) / (n_mixed * n_ped),
                     real_pos / (n_reals * n_ped),
                     fake_pos / (n_fakes * n_ped)])


def compute_wasserstein(reals: np.ndarray, fakes: np.ndarray,
                        obsv_len: int = 2) -> float:
    """EMD via optimal assignment, averaged over samples and pedestrians
    (calc_statistics.py:48-66)."""
    # the assignment produces min(K_real, K_fake) matched pairs per
    # pedestrian — normalize by THAT, not n_reals, or a fake set smaller
    # than the real set deflates the EMD
    n_pairs = min(reals.shape[0], fakes.shape[0])
    n_ped = reals.shape[1]
    cost = 0.0
    for kk in range(n_ped):
        d = _pairwise_traj_dist(reals[:, kk, obsv_len:],
                                fakes[:, kk, obsv_len:])
        ri, ci = linear_sum_assignment(d)
        cost += d[ri, ci].sum()
    return cost / (n_pairs * n_ped)


def stats_for_dump(npz_path: str, real_samples: np.ndarray,
                   obsv_len: int | None = None
                   ) -> Tuple[float, float, int]:
    """One dumped npz vs the real sample set.

    real_samples: [K, nPed, T, 2] full real trajectories (obs+pred).
    Returns (one_nn_acc, emd, nPed)."""
    data = np.load(npz_path)
    obsvs, preds_our = data["obsvs"], data["preds_our"]
    k = real_samples.shape[0]
    n_ped = obsvs.shape[0]
    n_past = obsvs.shape[1]
    if obsv_len is None:
        obsv_len = n_past

    # fake full trajectories: obs (replicated over K) + first K predictions
    fake = np.concatenate(
        [np.broadcast_to(obsvs[None], (k,) + obsvs.shape),
         preds_our[:k, ..., :2]], axis=2)
    reals = real_samples[:, :n_ped]
    one_nn = compute_1nn(reals, fake, obsv_len)[0]
    emd = compute_wasserstein(reals, fake, obsv_len)
    return one_nn, emd, n_ped


def calc_and_store_stats(main_dir: str, real_samples: np.ndarray,
                         num_samples: int = 20, min_peds: int = 6
                         ) -> Dict[int, Tuple[float, float]]:
    """Walk epoch sub-dirs of ``main_dir`` (as written by cli train
    --dump-dir), compute per-epoch mean 1-NN/EMD, and cache to
    ``stats<num_samples>.npz`` (calc_statistics.py:70-119)."""
    per_epoch: Dict[int, Tuple[float, float]] = {}
    for dirpath, _, filenames in sorted(os.walk(main_dir)):
        cur = os.path.basename(dirpath)
        if not cur.isdigit():
            continue
        epoch = int(cur)
        s1 = sw = nf = 0
        for f in sorted(filenames):
            if "npz" not in f or "stats" in f:
                continue
            one_nn, emd, n_ped = stats_for_dump(
                os.path.join(dirpath, f), real_samples[:num_samples])
            if n_ped < min_peds:
                continue
            s1 += one_nn
            sw += emd
            nf += 1
        if nf:
            per_epoch[epoch] = (s1 / nf, sw / nf)

    epochs = sorted(per_epoch)
    np.savez(os.path.join(main_dir, f"stats{num_samples}.npz"),
             epochs=np.array(epochs),
             stats_1nn=np.array([per_epoch[e][0] for e in epochs]),
             stats_wst=np.array([per_epoch[e][1] for e in epochs]))
    return per_epoch


def load_real_samples(dataset_npz: str, group: int = 6) -> np.ndarray:
    """Real toy trajectories grouped into K sample sets of ``group``
    pedestrians (calc_statistics.py:164-172)."""
    real = np.load(dataset_npz)
    samples = np.concatenate([real["obsvs"], real["preds"]], axis=1)
    t = samples.shape[1]
    return samples.reshape(-1, group, t, 2)


def toy_mode_coverage(obsvs: np.ndarray, preds_k: np.ndarray,
                      mode_angles=(-16.0, 0.0, 16.0),
                      tol_deg: float = 8.0) -> float:
    """Fraction of the toy dataset's turn modes covered by K samples.

    The toy set (data.toy) branches each approach direction into turn modes
    at ±16°·k; a sample "hits" a mode when its final-point bearing,
    relative to the approach direction, lies within ``tol_deg`` of the mode
    center.  Returns the mean over agents of (#modes hit by the K samples)
    / n_modes — 1.0 = full multi-modal coverage, 1/n_modes ≈ collapse.

    obsvs: [N, n_past, 2] world coords; preds_k: [K, N, T, 2] world coords.
    """
    modes = toy_turn_modes(obsvs, preds_k[..., -1, :], mode_angles, tol_deg)
    hits = np.stack([(modes == mi).any(axis=0)
                     for mi in range(len(mode_angles))])
    return float(hits.mean())


def toy_turn_modes(obsvs: np.ndarray, finals: np.ndarray,
                   mode_angles=(-16.0, 0.0, 16.0),
                   tol_deg: float = 8.0) -> np.ndarray:
    """Per-sample toy mode index into ``mode_angles``, -1 = off-mode.

    obsvs [N, n_past, 2] and finals [..., N, 2] are WORLD coords; leading
    axes of ``finals`` broadcast (e.g. [codes, K, N, 2]).  This is THE
    classifier behind ``toy_mode_coverage`` — diagnostics (the dip
    histogram in benchmarks/dip_diagnosis.py) import it so both statistics
    always classify with identical constants.  The default angles/tol make
    mode bands disjoint (±16° centers, 8° half-width), so assignment order
    cannot matter."""
    approach = np.degrees(np.arctan2(obsvs[:, 0, 1], obsvs[:, 0, 0]))
    ang = np.degrees(np.arctan2(finals[..., 1], finals[..., 0]))
    turn = (ang - approach + 180.0) % 360.0 - 180.0
    mode = np.full(turn.shape, -1, np.int32)
    for mi, m in enumerate(mode_angles):
        mode = np.where(np.abs(turn - m) < tol_deg, mi, mode)
    return mode
