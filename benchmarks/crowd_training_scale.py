"""One-chip crowd-scale social GAN TRAINING benchmark (ROADMAP §4).

Measures the full gan_step (unrolled D + G update, social attention
fwd+bwd) at crowd sizes, with the memory levers as flags:
--max-scene-size (windowed linear attention), --remat-steps (per-step
remat), --serial-rollout (phase-serialized rollout vjp), --bf16.

Round-1 ceiling: 524,288 agents/chip; 1M failed in the TPU compiler
(scan-carry residual sum).  serial_rollout targets exactly that sum.

Usage:
    python benchmarks/crowd_training_scale.py --sizes 262144,524288,1048576 \
        --max-scene-size 64 --remat-steps --serial-rollout [--bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_size(n: int, args) -> dict:
    import jax
    import jax.numpy as jnp
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.engine import gan_step, init_train_state

    cfg = TrainConfig(
        hidden_size=64, social_feature_size=64, noise_len=32,
        n_past=8, n_next=12, n_unrolling_steps=args.unroll,
        use_social=True, max_scene_size=args.max_scene_size,
        remat_steps=args.remat_steps, serial_rollout=args.serial_rollout,
        grad_accum=args.grad_accum, use_pallas=args.pallas,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    if args.grad_accum > 1:
        chunk_rows = n // args.grad_accum
        assert chunk_rows % max(args.max_scene_size, 1) == 0, (
            "micro-chunks must align to scene boundaries")
    state = init_train_state(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    scene = max(args.max_scene_size, 1)
    batch = {
        "obsvs": jnp.asarray(
            np.cumsum(rng.randn(n, cfg.n_past, 2) * 0.01, 1)
            .astype(np.float32)),
        "preds": jnp.asarray(
            rng.rand(n, cfg.n_next, 2).astype(np.float32)),
        "scene_ids": jnp.asarray((np.arange(n) // scene).astype(np.int32)),
        "valid": jnp.ones((n,), bool),
    }

    import functools
    step = functools.partial(gan_step, cfg=cfg)

    # batch must be a jit ARGUMENT: captured in the closure it becomes an
    # HLO constant and the remote-compile request body blows past the
    # tunnel's length limit (HTTP 413) at >=2M agents
    @jax.jit
    def run(state, batch, keys):
        def body(s, k):
            s2, m = step(s, batch, k)
            return s2, m.g_loss
        return jax.lax.scan(body, state, keys)

    n_steps = args.steps
    keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
    try:
        tic = time.perf_counter()
        s2, losses = run(state, batch, keys)
        float(jnp.sum(losses))
        compile_and_first = time.perf_counter() - tic
        tic = time.perf_counter()
        s2, losses = run(state, batch, keys)
        float(jnp.sum(losses))                    # forces a host transfer
        elapsed = time.perf_counter() - tic
    except Exception as e:
        msg = str(e)
        return {"n_agents": n, "ok": False,
                "error": msg[:300] + ("..." if len(msg) > 300 else "")}
    ms = elapsed / n_steps * 1e3
    return {
        "n_agents": n, "ok": True,
        "ms_per_step": round(ms, 2),
        "agent_grad_steps_per_sec": round(n / (ms / 1e3), 1),
        "compile_s": round(compile_and_first - elapsed, 1),
        "loss_finite": bool(np.isfinite(float(losses[-1]))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="262144,524288,1048576")
    ap.add_argument("--max-scene-size", type=int, default=64)
    ap.add_argument("--remat-steps", action="store_true")
    ap.add_argument("--serial-rollout", action="store_true")
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true",
                    help="route attention through the Pallas kernels "
                         "(chunked fused fwd+bwd above the VMEM caps)")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    results = []
    for s in args.sizes.split(","):
        r = bench_size(int(s), args)
        r["flags"] = {"max_scene": args.max_scene_size,
                      "remat": args.remat_steps,
                      "serial": args.serial_rollout, "bf16": args.bf16,
                      "pallas": args.pallas,
                      "unroll": args.unroll, "grad_accum": args.grad_accum}
        print(json.dumps(r), flush=True)
        results.append(r)
        if not r["ok"]:
            break
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
