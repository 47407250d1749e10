"""Checkpoint / resume.

The reference saves a flat torch dict of module + optimizer states every 50
epochs and auto-resumes at startup (train.py:622-663).  It omits RNG state
and the normalization Scale; we checkpoint the FULL training pytree —
generator/discriminator params, both optimizer states, epoch, PRNG key, the
fitted Scale, AND the model-defining TrainConfig fields — so a resumed run
is bit-identical to an uninterrupted one and a served checkpoint can never
be silently interpreted by the wrong model function.

Why the config must travel with the weights: an ``--agent-frame
--use-social`` checkpoint has the *identical pytree structure* as a plain
one, so it loads cleanly under the wrong flags and silently produces
world-frame, social-less rollouts — garbage with no error.  The reference
can't hit this failure only because it has no flags to mismatch
(train.py:622-634 resumes into the one hard-coded config).  Consumers call
``load_checkpoint_config`` / ``adopt_checkpoint_config`` BEFORE building
the restore template, because the template's structure itself depends on
these fields.

Backend: a single npz file of the flattened pytree (atomic rename).  At
this state size (<1 MB) a directory-per-step checkpointer like orbax buys
nothing; npz keeps checkpoints trivially portable and inspectable, and the
flatten/unflatten round-trip is structure-checked against the init-built
template on restore.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from socialways_tpu.config import TrainConfig
from socialways_tpu.data.scale import Scale
from socialways_tpu.engine.train_step import TrainState

# Fields that define the model FUNCTION (pytree structure and/or the math
# that interprets the weights).  Everything else (lrs, schedules, loss
# weights, io paths, runtime toggles) only shapes how training proceeds and
# stays CLI-controlled.
MODEL_CONFIG_FIELDS = (
    # data window geometry (D's pred branch flattens n_next*4)
    "n_past", "n_next",
    # architecture widths / shapes
    "hidden_size", "n_lstm_layers", "num_social_features",
    "social_feature_size", "noise_len", "decoder",
    # latent code head + noise semantics
    "n_latent_codes", "latent_code_type", "noise_dist",
    # model-structure toggles (change pytree structure or input widths)
    "mb_std", "pac", "spectral_norm", "g_ema_decay",
    # interpretation of inputs/outputs (same structure, different math —
    # the silent-corruption class)
    "use_social", "agent_frame",
)


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
                    rng: jax.Array, scale: Optional[Scale] = None,
                    cfg: Optional[TrainConfig] = None) -> None:
    """Write a single-file npz checkpoint (atomic rename).  When ``cfg``
    is given, its MODEL_CONFIG_FIELDS are embedded so restore-side
    consumers can rebuild the right model without CLI flags."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = _flatten(state)
    payload["__epoch__"] = np.asarray(epoch, np.int64)
    payload["__rng__"] = np.asarray(jax.random.key_data(rng))
    if scale is not None:
        for k, v in scale.to_dict().items():
            payload[f"__scale__/{k}"] = np.asarray(v)
    if cfg is not None:
        cfg_dict = {f: getattr(cfg, f) for f in MODEL_CONFIG_FIELDS}
        payload["__config__"] = np.asarray(json.dumps(cfg_dict))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint_config(path: str) -> Optional[dict]:
    """The model-defining config dict embedded in a checkpoint, or None
    for pre-round-5 checkpoints that don't carry one (those still load;
    the caller falls back to CLI flags, the old behavior)."""
    with np.load(path) as data:
        if "__config__" in data.files:
            return json.loads(str(data["__config__"]))
    return None


def adopt_checkpoint_config(cfg: TrainConfig, path: str,
                            warn_stream=None) -> TrainConfig:
    """Return ``cfg`` with the checkpoint's model-defining fields adopted.

    CLI values that differ from BOTH the TrainConfig default and the
    checkpoint are explicit contradictions: warn loudly and use the
    checkpoint's value anyway — the checkpoint is ground truth for what
    the weights ARE; honoring the contradicting flag either crashes on
    structure mismatch or (worse) silently serves the wrong frame.
    Checkpoints without an embedded config return ``cfg`` unchanged."""
    saved = load_checkpoint_config(path)
    if saved is None:
        return cfg
    warn_stream = warn_stream if warn_stream is not None else sys.stderr
    defaults = TrainConfig()
    overrides = {}
    for field, ckpt_val in saved.items():
        cli_val = getattr(cfg, field)
        if cli_val == ckpt_val:
            continue
        if cli_val != getattr(defaults, field):
            # name the config FIELD, not a fabricated "--flag": several
            # fields derive from one flag (--h-size sets hidden_size,
            # social_feature_size and noise_len) and some have no flag
            print(f"WARNING: requested {field}={cli_val!r} contradicts "
                  f"the checkpoint's {field}={ckpt_val!r}; using the "
                  f"checkpoint's value (the weights were trained with "
                  f"it)", file=warn_stream)
        overrides[field] = ckpt_val
    return cfg.replace(**overrides) if overrides else cfg


def restore_checkpoint(path: str, template: TrainState
                       ) -> Tuple[TrainState, int, jax.Array,
                                  Optional[Scale]]:
    """Restore into the structure of ``template`` (built by
    ``init_train_state`` with the same config)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    epoch = int(flat.pop("__epoch__"))
    rng = jax.random.wrap_key_data(flat.pop("__rng__"))
    flat.pop("__config__", None)     # surfaced via load_checkpoint_config
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
