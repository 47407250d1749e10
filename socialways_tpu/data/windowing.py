"""Sliding-window dataset assembly.

Parity with the reference ``create_dataset`` (utils/parse_utils.py:457-508):
for every frame ``t`` and agent with a full past (``n_past`` frames ending at
``t-step``) and future (``n_next`` frames starting at ``t``), emit an
(obs, pred) pair anchored at ``t``; group samples sharing an anchor frame into
contiguous ``sub_batches`` [start, end) ranges and re-pack arrays
batch-contiguous.

Quirks preserved on purpose (callers depend on the grouping):
- anchors are scanned with stride 1 regardless of the frame interval;
- a sample whose anchor is exactly ``last_included_t + 1`` falls in neither
  grouping branch and is dropped from the packed output (reference
  parse_utils.py:482-488) — harmless for interval>1 data.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def create_dataset(
    p_data: Sequence[np.ndarray],
    t_data: Sequence[np.ndarray],
    t_range: range,
    n_past: int = 8,
    n_next: int = 12,
) -> Tuple[np.ndarray, np.ndarray, List[int], np.ndarray]:
    """Returns (obsvs [N, n_past, 2], preds [N, n_next, 2], times, batches)."""
    step = t_range.step
    anchor_t: List[int] = []
    obs_list: List[np.ndarray] = []
    pred_list: List[np.ndarray] = []

    # Window enumeration runs in the native core when built (C++ binary
    # search per anchor; socialways_tpu/native) with a NumPy fallback —
    # both produce the reference's anchor-major, then agent order.
    from socialways_tpu.native.loader import window_indices

    hits = window_indices(list(t_data), t_range.start, t_range.stop, step,
                          n_past, n_next)
    for a, kp, k0, kf, t in hits:
        anchor_t.append(int(t))
        obs_list.append(p_data[a][kp:k0])
        pred_list.append(p_data[a][k0:kf + 1])

    # group consecutive equal anchors into [start, end) sub-batches
    sub_batches: List[List[int]] = []
    last_included_t = -1000
    min_interval = 1
    for i, t in enumerate(anchor_t):
        if t > last_included_t + min_interval:
            sub_batches.append([i, i + 1])
            last_included_t = t
        elif t == last_included_t:
            sub_batches[-1][1] = i + 1

    # re-pack batch-contiguous and re-base the ranges
    obs_kept, pred_kept, t_kept = [], [], []
    batches = []
    cursor = 0
    for s, e in sub_batches:
        obs_kept.extend(obs_list[s:e])
        pred_kept.extend(pred_list[s:e])
        t_kept.extend(anchor_t[s:e])
        batches.append([cursor, cursor + (e - s)])
        cursor += e - s

    if obs_kept:
        obsvs = np.asarray(obs_kept, dtype=np.float32)
        preds = np.asarray(pred_kept, dtype=np.float32)
        batches_arr = np.asarray(batches, dtype=np.int32)
    else:
        obsvs = np.zeros((0, n_past, 2), np.float32)
        preds = np.zeros((0, n_next, 2), np.float32)
        batches_arr = np.zeros((0, 2), np.int32)
    return obsvs, preds, t_kept, batches_arr
