"""Run the ACTUAL reference (/root/reference/train.py) on a given npz and
measure its true training steps/s — the ground-truth baseline for every
"x the reference" ratio in BASELINE.md (VERDICT r1 "what's missing" #2).

The reference is a single-GPU eager-PyTorch script that runs at import
(train.py:89-124,646-668).  It needs three environment shims, none of which
touch its math:

- ``time.clock`` was removed in Python 3.8 (used train.py:440,557) — we
  install ``time.perf_counter`` under that name, and also RECORD every call:
  train() brackets each epoch with exactly two time.clock() calls, so the
  recorded pairs are exact per-epoch wall times without parsing stdout.
- ``.cuda()`` must be a no-op (no CUDA here; train.py:123-124,370-400) —
  torch.Tensor.cuda / torch.nn.Module.cuda return self.
- the input path is hard-coded '../hotel-8-12.npz' (train.py:55) — we run
  inside a sandbox dir whose parent holds a copy of the requested npz.

Usage:
    python benchmarks/run_reference.py --npz <file.npz> --epochs 12 \
        [--out result.json] [--batch-size 256]

Steps/epoch is derived by replicating the reference's greedy scene-batch
accumulation (train.py:446-456) over the npz's ``batches`` table.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REFERENCE = "/root/reference/train.py"


def count_chunks(batches, batch_size: int, train_size: int) -> int:
    """Replicate train.py:446-456: greedy accumulation of scene batches
    into chunks of <= batch_size (one optimizer step per chunk)."""
    n_chunks = 0
    accum = 0
    for ii in range(train_size):
        accum += batches[ii][1] - batches[ii][0]
        nxt = (batches[ii + 1][1] - batches[ii + 1][0]
               if ii + 1 < len(batches) else 0)
        if ii >= train_size - 1 or accum + nxt > batch_size:
            n_chunks += 1
            accum = 0
    return n_chunks


_EVAL_RE = (r"Avg ADE,FDE \(12\)= \(([\d.]+), ([\d.]+)\) \| "
            r"Min\(20\) ADE,FDE \(12\)= \(([\d.]+), ([\d.]+)\)")


def _capture_test(mod_globals, **kwargs):
    """Run the reference's own test() (train.py:563-616) over the FULL
    held-out split (just_one=False) and parse its printed ADE/FDE."""
    import contextlib
    import io
    import re
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod_globals["test"](**kwargs)
    m = re.search(_EVAL_RE, buf.getvalue())
    assert m, f"could not parse test() output: {buf.getvalue()!r}"
    return {"ade_avg": float(m.group(1)), "fde_avg": float(m.group(2)),
            "ade_min20": float(m.group(3)), "fde_min20": float(m.group(4))}


def run(npz: str, epochs: int, batch_size: int = 256,
        final_test: bool = False):
    import numpy as np
    import torch

    data = np.load(npz)
    train_size = max(1, (len(data["batches"]) * 4) // 5)
    n_chunks = count_chunks(data["batches"], batch_size, train_size)

    sandbox = tempfile.mkdtemp(prefix="refbench_")
    rundir = os.path.join(sandbox, "run")
    os.makedirs(rundir)
    os.makedirs(os.path.join(sandbox, "trained_models"))
    shutil.copy(npz, os.path.join(sandbox, "hotel-8-12.npz"))

    clock_calls = []

    def clock():
        t = time.perf_counter()
        clock_calls.append(t)
        return t

    time.clock = clock
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    argv0 = sys.argv
    cwd0 = os.getcwd()
    sys.argv = ["train.py", "--epochs", str(epochs),
                "--batch-size", str(batch_size)]
    os.chdir(rundir)
    sys.path.insert(0, os.path.dirname(REFERENCE))
    final = None
    try:
        import runpy
        g = runpy.run_path(REFERENCE, run_name="__main__")
        if final_test:
            # full-split eval with the reference's own test() — the
            # in-training eval is just_one=True (first test batch only,
            # train.py:668)
            final = _capture_test(g, n_gen_samples=20)
            final["linear"] = _capture_test(g, linear=True)
    finally:
        os.chdir(cwd0)
        sys.argv = argv0
        sys.path.pop(0)
        del time.clock

    # train() calls time.clock() exactly twice per epoch (tic/toc)
    assert len(clock_calls) == 2 * epochs, (
        f"expected {2 * epochs} time.clock calls, saw {len(clock_calls)}")
    epoch_times = [clock_calls[2 * i + 1] - clock_calls[2 * i]
                   for i in range(epochs)]
    # skip the first epoch (allocator/threadpool warmup)
    steady = epoch_times[1:] or epoch_times
    sps = n_chunks * len(steady) / sum(steady)
    if final is not None:
        return {
            "final_eval": final,
            "reference_steps_per_sec": round(sps, 3),
            "n_chunks_per_epoch": n_chunks,
            "epochs": epochs,
            "npz": os.path.abspath(npz),
            "sandbox": sandbox,
        }
    return {
        "reference_steps_per_sec": round(sps, 3),
        "n_chunks_per_epoch": n_chunks,
        "epochs_timed": len(steady),
        "epoch_time_s_mean": round(sum(steady) / len(steady), 4),
        "epoch_time_s_first": round(epoch_times[0], 4),
        "npz": os.path.abspath(npz),
        "batch_size": batch_size,
        "torch_threads": torch.get_num_threads(),
        "sandbox": sandbox,
    }


def make_bench_npz(path: str, n_train_chunks: int = 5,
                   scene_size: int = 8, n_scenes_per_chunk: int = 32,
                   n_past: int = 8, n_next: int = 12, seed: int = 0):
    """Synthetic npz shaped exactly like bench.py's headline config:
    chunks of 256 samples = 32 scenes x 8 agents, 8 obs / 12 pred steps.
    5 extra scene-batch groups form the 1/5 test split."""
    import numpy as np
    rng = np.random.RandomState(seed)
    n_batches_total = n_train_chunks * n_scenes_per_chunk * 5 // 4
    n = n_batches_total * scene_size
    start = rng.rand(n, 1, 2).astype(np.float32) * 8.0
    vel = (rng.rand(n, 1, 2).astype(np.float32) - 0.5) * 0.2
    t = np.arange(n_past + n_next, dtype=np.float32)[None, :, None]
    traj = start + vel * t + rng.randn(n, n_past + n_next, 2).astype(
        np.float32) * 0.02
    batches = np.asarray(
        [[i * scene_size, (i + 1) * scene_size]
         for i in range(n_batches_total)], dtype=np.int16)
    times = np.repeat(np.arange(n_batches_total), scene_size)
    np.savez(path, obsvs=traj[:, :n_past].astype(np.float32),
             preds=traj[:, n_past:].astype(np.float32),
             times=times.astype(np.int32), batches=batches)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="",
                    help="npz to train on (default: generate the "
                         "bench-shaped synthetic one)")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--out", default="")
    ap.add_argument("--final-test", action="store_true",
                    help="after training, run the reference's test() over "
                         "the FULL held-out split (and the CV-linear "
                         "baseline) and report the parsed ADE/FDE")
    args = ap.parse_args()

    npz = args.npz
    if not npz:
        npz = os.path.join(tempfile.gettempdir(), "refbench_data.npz")
        make_bench_npz(npz)
    result = run(npz, args.epochs, args.batch_size,
                 final_test=args.final_test)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
