"""Device mesh + data-parallel training over ICI.

The reference is strictly single-device (SURVEY §2.3: no torch.distributed,
the whole dataset lives on one GPU).  This module is its TPU-native
replacement: a 1-D ``data`` mesh, ``shard_map``-ed GAN steps with gradient
``pmean`` riding ICI collectives, and scene-aligned batch sharding.

Scene alignment is the key invariant: each device receives whole packed
chunks, so the NxN social attention (which never crosses scene boundaries,
train.py:163-173) never needs cross-device communication — the only
collectives in the step are the gradient/metric reductions.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from socialways_tpu.config import TrainConfig
from socialways_tpu.engine.train_step import gan_step
from socialways_tpu.eval.metrics import EvalSums, eval_chunk

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D mesh over the ``data`` axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(n_dcn: int, n_ici: int, devices=None) -> Mesh:
    """Hierarchical 2-D mesh ``(dcn, data)`` for multi-slice deployments:
    the inner ``data`` axis rides ICI within a slice, the outer ``dcn``
    axis crosses slices over the data-center network.  XLA lowers a
    ``pmean`` over both axes into the hierarchical all-reduce
    (reduce-scatter within the slice, cross-slice exchange of the
    partials, all-gather back) — the standard multi-pod recipe, SURVEY
    §5.8.

    Devices are laid out dcn-major, so the flattened device order equals
    the 1-D ``make_mesh`` order and the two forms consume identical
    noise streams (engine.train_step._flat_axis_index).  On real
    multi-slice hardware, pass ``devices`` grouped slice-by-slice (e.g.
    from ``jax.experimental.mesh_utils.create_hybrid_device_mesh``) so
    the inner axis actually maps onto ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_dcn * n_ici]).reshape(n_dcn, n_ici)
    return Mesh(devices, (DCN_AXIS, DATA_AXIS))


def _mesh_axes(mesh: Mesh):
    """(axis_name, batch-leading-axis spec) for 1-D and hierarchical
    meshes: a 1-D mesh keeps the plain ``"data"`` form; a multi-axis mesh
    shards the batch's leading axis over ALL axes jointly and reduces
    over the axis tuple (XLA then picks hierarchical collectives)."""
    names = mesh.axis_names
    if len(names) == 1:
        return names[0], P(names[0])
    return tuple(names), P(tuple(names))


def batch_pspec(mesh: Optional[Mesh] = None) -> Dict[str, P]:
    spec = P(DATA_AXIS) if mesh is None else _mesh_axes(mesh)[1]
    return {k: spec for k in ("obsvs", "preds", "scene_ids", "valid")}


def make_dp_train_step(cfg: TrainConfig, mesh: Mesh):
    """Build the jitted data-parallel GAN step.

    The global batch's leading axis is sharded over the mesh's data axes;
    state and rng are replicated.  Each shard must be scene-aligned (use
    ``pack_scene_batches`` per shard, or shard the chunk axis).  Works on
    the 1-D ``data`` mesh and on the hierarchical ``(dcn, data)`` mesh
    (``make_mesh_2d``) — gradients pmean over the axis tuple, which XLA
    lowers to the reduce-scatter-within-slice / cross-slice hierarchy.
    """
    axis_name, _ = _mesh_axes(mesh)
    fn = shard_map(
        functools.partial(gan_step, cfg=cfg, axis_name=axis_name,
                          axis_size=mesh.devices.size),
        mesh=mesh,
        in_specs=(P(), batch_pspec(mesh), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def grouped_pspec(mesh: Optional[Mesh] = None) -> Dict[str, P]:
    """Specs for ``shard_packed_for_mesh`` output: [groups, n_dev·width, …]
    with the sample axis (axis 1) sharded over the mesh's data axes."""
    axes = DATA_AXIS if mesh is None else _mesh_axes(mesh)[0]
    return {k: P(None, axes)
            for k in ("obsvs", "preds", "scene_ids", "valid")}


def make_dp_epoch_fn(cfg: TrainConfig, mesh: Mesh):
    """Fused data-parallel epoch: ONE device program scanning the DP GAN
    step over chunk groups (the mesh composition of the epoch-on-device
    trainer, VERDICT r1 #4).

    Takes ``shard_packed_for_mesh`` output ([groups, n_dev·width, ...]);
    each device scans over its own chunk column while gradients pmean over
    ICI inside every step.  Metrics come back globally reduced (identical
    on every device, hence replicated out_specs)."""
    from socialways_tpu.engine.train_step import StepMetrics

    n_dev = mesh.devices.size
    axis_name, _ = _mesh_axes(mesh)

    def epoch_body(state, batches, rng):
        n_groups = batches["obsvs"].shape[0]
        keys = jax.random.split(rng, n_groups)

        def body(carry, xs):
            chunk, key = xs
            return gan_step(carry, chunk, key, cfg, axis_name=axis_name,
                            axis_size=n_dev)

        state, ms = jax.lax.scan(body, state, (batches, keys))
        return state, StepMetrics(
            d_loss=jnp.mean(ms.d_loss),
            g_loss=jnp.mean(ms.g_loss),
            ade_sum=jnp.sum(ms.ade_sum),
            fde_sum=jnp.sum(ms.fde_sum),
            n_samples=jnp.sum(ms.n_samples),
        )

    fn = shard_map(epoch_body, mesh=mesh,
                   in_specs=(P(), grouped_pspec(mesh), P()),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn), epoch_body


def make_dp_epochs_fn(cfg: TrainConfig, mesh: Mesh):
    """``n`` fused DP epochs as ONE device program (scan over epochs of
    the scan over chunk groups) — zero host round-trips inside the block.
    Returns fn(state, batches, rng, n) with static ``n``."""
    _, epoch_body = make_dp_epoch_fn(cfg, mesh)

    def epochs_body(state, batches, rng, n):
        keys = jax.random.split(rng, n)

        def body(carry, key):
            return epoch_body(carry, batches, key)

        state, ms = jax.lax.scan(body, state, keys)
        last = jax.tree_util.tree_map(lambda x: x[-1], ms)
        return state, last

    def run(state, batches, rng, n):
        fn = shard_map(functools.partial(epochs_body, n=n),
                       mesh=mesh, in_specs=(P(), grouped_pspec(mesh), P()),
                       out_specs=(P(), P()), check_vma=False)
        return fn(state, batches, rng)

    return jax.jit(run, static_argnames=("n",))


def make_dp_eval_chunk(cfg: TrainConfig, mesh: Mesh, k: int):
    """Data-parallel K-sample eval: batch rows sharded over the mesh's data
    axes (1-D or hierarchical); each device evaluates its local rows under
    all K draws (slicing its rows of the GLOBAL noise draw, so sharded
    eval == single-device eval exactly); sums are psum'd."""
    n_dev = mesh.devices.size
    axis_name, _ = _mesh_axes(mesh)

    def _eval(g_params, batch, rng):
        sums = eval_chunk(g_params, batch, rng, k, cfg,
                          axis_name=axis_name, axis_size=n_dev)
        return EvalSums(*(jax.lax.psum(s, axis_name) for s in sums))

    fn = shard_map(_eval, mesh=mesh,
                   in_specs=(P(), batch_pspec(mesh), P()),
                   out_specs=P(),
                   check_vma=False)
    return jax.jit(fn)


def shard_packed_for_mesh(packed, mesh: Mesh):
    """Pad the chunk axis to a multiple of the mesh size and lay chunks out
    so that consecutive chunks land on different devices; returns device
    arrays for a scan over chunk *groups* of size n_dev."""
    n_dev = mesh.devices.size
    n = packed.n_chunks
    pad = (-n) % n_dev
    def prep(x):
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        # [groups, n_dev * width, ...] — flatten chunk-of-group into the
        # sample axis so shard_map splits it back per device
        g = x.shape[0] // n_dev
        return x.reshape((g, n_dev * x.shape[1]) + x.shape[2:])

    out = {
        "obsvs": prep(packed.obsvs),
        "preds": prep(packed.preds),
        "scene_ids": prep(packed.scene_ids),
        "valid": prep(packed.valid),
    }
    if pad:
        # padded filler chunks: mark invalid
        out["scene_ids"][-1, -pad * packed.width:] = -1
        out["valid"][-1, -pad * packed.width:] = False
    return {k: jnp.asarray(v) for k, v in out.items()}
