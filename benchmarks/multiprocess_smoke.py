"""Two-process jax.distributed smoke for the multi-host data feed.

parallel/datafeed.py was unit-tested only in its single-process degenerate
form (VERDICT-r3 missing #3): nothing had ever exercised
``jax.make_array_from_process_local_data`` with ``jax.process_count() > 1``.
This driver launches TWO real OS processes on this host, each owning half
of an 8-device forced-CPU platform, joined via
``jax.distributed.initialize`` against a local coordinator:

- each process streams ONLY its own chunk groups through
  ``host_chunk_feed`` (no process ever materializes the other's rows),
- the globally-sharded batches drive ``make_dp_train_step`` for several
  steps,
- the per-step g/d losses are asserted equal (tolerance: float
  reassociation) to a SINGLE-process run of the identical mesh/feed —
  the parity the module's docstring promises.

Usage (parent orchestrates everything):
    python benchmarks/multiprocess_smoke.py --steps 6 \
        --out benchmarks/multiprocess_smoke_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

LOCAL_DEVICES = 4          # per process; 2 processes → 8 global devices


def child(args) -> None:
    # drop any inherited device-count force (e.g. the test conftest's 8)
    # before setting this process's own
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(
        f"--xla_force_host_platform_device_count={args.local_devices}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
    assert jax.device_count() == args.num_processes * args.local_devices
    assert jax.process_count() == args.num_processes

    import numpy as np

    from socialways_tpu.config import TrainConfig
    from socialways_tpu.data.dataset import load_npz_dataset, \
        pack_scene_batches
    from socialways_tpu.data.toy import make_toy_npz_arrays
    from socialways_tpu.engine.train_step import init_train_state
    from socialways_tpu.parallel import host_chunk_feed, make_mesh
    from socialways_tpu.parallel.mesh import make_dp_train_step

    import tempfile
    with tempfile.TemporaryDirectory(prefix="mpsmoke_") as td:
        npz = os.path.join(td, "toy.npz")
        # deterministic (seed-30) — both processes build identical data
        np.savez(npz, **make_toy_npz_arrays())
        ds = load_npz_dataset(npz)

    # this process only KEEPS its own slice of each group inside
    # host_chunk_feed; the packed layout itself is deterministic
    packed = pack_scene_batches(ds.obsvs[:ds.n_train_samples],
                                ds.preds[:ds.n_train_samples],
                                ds.train_batches, batch_size=8)
    cfg = TrainConfig(batch_size=8, hidden_size=32,
                      social_feature_size=32, noise_len=16,
                      n_past=ds.obsvs.shape[1], n_next=ds.preds.shape[1],
                      n_unrolling_steps=1)
    mesh = make_mesh()                       # all 8 GLOBAL devices
    step = make_dp_train_step(cfg, mesh)
    state = init_train_state(jax.random.PRNGKey(0), cfg)

    g_losses, d_losses = [], []
    done = 0
    ckpt_at = args.steps // 2 if args.ckpt_dir else -1
    for g, batch in host_chunk_feed(packed, mesh):
        state, m = step(state, batch, jax.random.PRNGKey(g))
        # metrics are replicated (out_specs P()) — every process can read
        g_losses.append(float(m.g_loss))
        d_losses.append(float(m.d_loss))
        done += 1
        if done == ckpt_at:
            # mid-run save/restore across processes (VERDICT-r4 next #7):
            # process 0 saves (state leaves are replicated over the
            # global mesh — every local device holds the full value, so
            # np.asarray per leaf is addressable from any process);
            # then EVERY process restores from the file and continues.
            # Loss-stream identity with the uninterrupted run is the
            # parity the parent asserts.
            from jax.experimental import multihost_utils

            from socialways_tpu.io.checkpoint import (restore_checkpoint,
                                                      save_checkpoint)
            ckpt = os.path.join(args.ckpt_dir, "mid.npz")
            if jax.process_index() == 0:
                save_checkpoint(ckpt, state, epoch=done,
                                rng=jax.random.PRNGKey(g), cfg=cfg)
            multihost_utils.sync_global_devices("ckpt_saved")
            template = init_train_state(jax.random.PRNGKey(0), cfg)
            state, ep, _, _ = restore_checkpoint(ckpt, template)
            assert ep == done
            multihost_utils.sync_global_devices("ckpt_restored")
        if done >= args.steps:
            break

    rec = {"process_id": args.process_id,
           "num_processes": args.num_processes,
           "global_devices": jax.device_count(),
           "local_devices": len(jax.local_devices()),
           "g_losses": g_losses, "d_losses": d_losses}
    print("CHILD_RESULT " + json.dumps(rec), flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(num_processes: int, steps: int,
            local_devices: int = LOCAL_DEVICES, ckpt_dir: str = ""):
    """Run `num_processes` children; return each child's parsed record."""
    port = _free_port()
    procs = []
    for pid in range(num_processes):
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--process-id", str(pid),
               "--num-processes", str(num_processes),
               "--coordinator", f"127.0.0.1:{port}",
               "--steps", str(steps),
               "--local-devices", str(local_devices)]
        if ckpt_dir:
            cmd += ["--ckpt-dir", ckpt_dir]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True,
                                      cwd=REPO))
    # Drain ALL children concurrently: a sequential communicate() leaves
    # the later children's pipes unread, and a warning burst past the
    # ~64KB pipe buffer would deadlock child N (blocked on write) against
    # child 0 (blocked in the collective waiting for N).
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(len(procs)) as ex:
        raw = list(ex.map(lambda p: p.communicate(timeout=900)[0], procs))
    outs = []
    for p, out in zip(procs, raw):
        if p.returncode != 0:
            raise RuntimeError(f"child rc={p.returncode}:\n{out[-4000:]}")
        rec = [ln for ln in out.splitlines()
               if ln.startswith("CHILD_RESULT ")]
        assert rec, out[-4000:]
        outs.append(json.loads(rec[-1][len("CHILD_RESULT "):]))
    return outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default="127.0.0.1:0")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--local-devices", type=int, default=LOCAL_DEVICES)
    ap.add_argument("--ckpt-dir", default="",
                    help="save a checkpoint from process 0 at steps/2 and "
                         "restore it in EVERY process before continuing "
                         "(mid-run multi-process checkpoint drill)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.child:
        child(args)
        return

    tic = time.perf_counter()
    # 4-device single-process sanity arm (different mesh, NOT the parity
    # target); the parity reference is one process with all 8 devices —
    # the same global mesh the two-process run assembles
    single = _launch(1, args.steps, LOCAL_DEVICES)[0]
    single8 = _launch(1, args.steps, 2 * LOCAL_DEVICES)[0]
    duo = _launch(2, args.steps, LOCAL_DEVICES)
    # mid-run checkpoint arm: process 0 saves at steps/2, both processes
    # restore and continue — the loss stream must be identical to the
    # uninterrupted 2-process run (save/restore is a no-op for the math)
    import tempfile
    with tempfile.TemporaryDirectory(prefix="mpsmoke_ckpt_") as ckd:
        duo_ckpt = _launch(2, args.steps, LOCAL_DEVICES, ckpt_dir=ckd)
    wall = round(time.perf_counter() - tic, 1)

    assert duo[0]["global_devices"] == 2 * LOCAL_DEVICES == \
        single8["global_devices"]
    assert duo[0]["local_devices"] == LOCAL_DEVICES
    # both processes observed identical replicated metrics
    assert duo[0]["g_losses"] == duo[1]["g_losses"]
    assert duo[0]["d_losses"] == duo[1]["d_losses"]
    import numpy as np
    np.testing.assert_allclose(duo[0]["g_losses"], single8["g_losses"],
                               rtol=2e-5)
    np.testing.assert_allclose(duo[0]["d_losses"], single8["d_losses"],
                               rtol=2e-5)
    # checkpoint round-trip is bit-exact on the loss stream: the state
    # leaves survive device->np.asarray->npz->device across processes
    assert duo_ckpt[0]["g_losses"] == duo[0]["g_losses"]
    assert duo_ckpt[0]["d_losses"] == duo[0]["d_losses"]
    assert duo_ckpt[0]["g_losses"] == duo_ckpt[1]["g_losses"]

    result = {
        "ok": True,
        "steps": args.steps,
        "wall_s": wall,
        "two_process": {"g_losses": duo[0]["g_losses"],
                        "d_losses": duo[0]["d_losses"],
                        "global_devices": duo[0]["global_devices"],
                        "local_devices_per_process":
                            duo[0]["local_devices"]},
        "single_process_8dev": {"g_losses": single8["g_losses"],
                                "d_losses": single8["d_losses"]},
        "single_process_4dev_sanity": {"g_losses": single["g_losses"]},
        "two_process_mid_ckpt": {
            "g_losses": duo_ckpt[0]["g_losses"],
            "d_losses": duo_ckpt[0]["d_losses"],
            "ckpt_at_step": args.steps // 2,
            "loss_stream_identical_to_uninterrupted": True},
        "note": "2-process jax.distributed CPU run: each process fed only "
                "its local chunk groups through host_chunk_feed / "
                "make_array_from_process_local_data; per-step losses match "
                "the single-process 8-device run; the mid-run checkpoint "
                "arm (save from process 0 at steps/2, restore in both, "
                "continue) reproduces the uninterrupted loss stream "
                "exactly",
    }
    print(json.dumps({k: result[k] for k in ("ok", "steps", "wall_s")}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
