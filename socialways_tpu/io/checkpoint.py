"""Checkpoint / resume.

The reference saves a flat torch dict of module + optimizer states every 50
epochs and auto-resumes at startup (train.py:622-663).  It omits RNG state
and the normalization Scale; we checkpoint the FULL training pytree —
generator/discriminator params, both optimizer states, epoch, PRNG key, and
the fitted Scale — so a resumed run is bit-identical to an uninterrupted one.

Backend: a single npz file of the flattened pytree (atomic rename).  At
this state size (<1 MB) a directory-per-step checkpointer like orbax buys
nothing; npz keeps checkpoints trivially portable and inspectable, and the
flatten/unflatten round-trip is structure-checked against the init-built
template on restore.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from socialways_tpu.data.scale import Scale
from socialways_tpu.engine.train_step import TrainState


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(template)
    treedef = paths_and_leaves[1]
    leaves = []
    for path, leaf in paths_and_leaves[0]:
        key = "/".join(str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {key} has shape {arr.shape}, "
                f"expected {np.shape(leaf)}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    rng: jax.Array, scale: Optional[Scale] = None) -> None:
    """Write a single-file npz checkpoint (atomic rename)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = _flatten(state)
    payload["__epoch__"] = np.asarray(epoch, np.int64)
    payload["__rng__"] = np.asarray(jax.random.key_data(rng))
    if scale is not None:
        for k, v in scale.to_dict().items():
            payload[f"__scale__/{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template: TrainState
                       ) -> Tuple[TrainState, int, jax.Array,
                                  Optional[Scale]]:
    """Restore into the structure of ``template`` (built by
    ``init_train_state`` with the same config)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    epoch = int(flat.pop("__epoch__"))
    rng = jax.random.wrap_key_data(flat.pop("__rng__"))
    scale_items = {k.split("/", 1)[1]: float(v) for k, v in list(flat.items())
                   if k.startswith("__scale__/")}
    for k in list(flat):
        if k.startswith("__scale__/"):
            del flat[k]
    scale = Scale.from_dict(scale_items) if scale_items else None
    state = _unflatten_like(template, flat)
    return state, epoch, rng, scale


def checkpoint_exists(path: str) -> bool:
    return os.path.isfile(path)
