"""Multi-host data feeding.

The reference keeps the whole dataset resident on one GPU (train.py:123-124).
Single-host multi-chip training replaces that with
:func:`mesh.shard_packed_for_mesh` (one ``jax.device_put`` of everything).
This module covers the multi-process (multi-host) case: each host loads and
holds ONLY its own chunk groups, and the global device array is assembled
with ``jax.make_array_from_process_local_data`` — no host ever materializes
the full dataset, and the host→device transfer is local to each host's
chips (DCN never sees bulk data; gradients ride ICI/DCN via psum as usual).

Single-process runs degenerate to exactly the single-host path, so all of
this is exercised by the CPU-mesh test suite; a real multi-host launch only
changes ``jax.process_count()``.
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from socialways_tpu.parallel.mesh import DATA_AXIS


def local_group_slice(n_groups: int, process_index: int | None = None,
                      process_count: int | None = None) -> slice:
    """The contiguous slice of chunk groups this host is responsible for.

    Groups are padded to a multiple of process_count by the packer, so the
    split is even; with one process this is slice(0, n_groups)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_groups // pc)                       # ceil
    return slice(pi * per, min((pi + 1) * per, n_groups))


def global_batch_from_local(mesh: Mesh, local: Dict[str, np.ndarray]
                            ) -> Dict[str, jax.Array]:
    """Assemble a globally-sharded batch from THIS process's local rows.

    ``local`` holds the rows for this host's mesh slots (leading axis =
    samples).  Returns jax.Arrays sharded ``P('data')`` over the full mesh;
    with one process this equals ``jax.device_put`` of the whole batch."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local.items()
    }


def host_chunk_feed(packed, mesh: Mesh,
                    process_index: int | None = None,
                    process_count: int | None = None
                    ) -> Iterator[Tuple[int, Dict[str, jax.Array]]]:
    """Stream (group_index, globally-sharded batch) pairs, holding only
    this host's shard of each group in host memory.

    ``packed`` is a PackedChunks (data.dataset.pack_scene_batches): chunk
    axis first.  Each yielded batch carries ``n_dev_global * width`` rows
    globally — feed it straight to ``make_dp_train_step``'s batch argument.
    """
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    n_dev_global = mesh.devices.size
    n_dev_local = n_dev_global // pc
    width = packed.width

    n = packed.n_chunks
    pad = (-n) % n_dev_global
    n_groups = (n + pad) // n_dev_global

    def chunk(arrs, idx):
        """Chunk `idx` of the padded stream (filler chunks are invalid)."""
        if idx < n:
            return {k: v[idx] for k, v in arrs.items()}
        return {
            "obsvs": np.zeros_like(arrs["obsvs"][0]),
            "preds": np.zeros_like(arrs["preds"][0]),
            "scene_ids": np.full((width,), -1,
                                 arrs["scene_ids"][0].dtype),
            "valid": np.zeros((width,), bool),
        }

    arrs = {"obsvs": packed.obsvs, "preds": packed.preds,
            "scene_ids": packed.scene_ids, "valid": packed.valid}
    for g in range(n_groups):
        # this host's chunks within the group: device slots
        # [pi*n_dev_local, (pi+1)*n_dev_local)
        base = g * n_dev_global + pi * n_dev_local
        local = [chunk(arrs, base + j) for j in range(n_dev_local)]
        cat = {k: np.concatenate([c[k] for c in local]) for k in arrs}
        yield g, global_batch_from_local(mesh, cat)
