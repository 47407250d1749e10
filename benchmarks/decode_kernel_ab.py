"""A/B the fused Pallas decode kernel inside the crowd-simulate loop.

VERDICT r1 #8: the kernel loses to XLA decode at every size measured
standalone; the one untested regime is its intended home — inside the
fused simulate program at crowd scale (windowed attention + decode, zero
host dispatch).  This measures crowd_simulate with pallas_decode on/off
at the given sizes; the loser gets deleted.

Usage:
    python benchmarks/decode_kernel_ab.py --sizes 10240,102400 \
        --max-scene-size 64 --windows 8
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench(n: int, pallas_decode: bool, args) -> dict:
    import jax
    import jax.numpy as jnp
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.engine.simulate import crowd_simulate
    from socialways_tpu.models import init_generator

    cfg = TrainConfig(hidden_size=64, social_feature_size=64, noise_len=32,
                      n_past=8, n_next=12, use_social=True,
                      use_pallas=not args.no_pallas_attention,
                      pallas_decode=pallas_decode,
                      max_scene_size=args.max_scene_size)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    scene = max(args.max_scene_size, 1)
    obsv0 = jnp.asarray(np.cumsum(rng.randn(n, cfg.n_past, 2) * 0.01, 1)
                        .astype(np.float32))
    ids = jnp.asarray((np.arange(n) // scene).astype(np.int32))

    fn = jax.jit(lambda p, r: crowd_simulate(p, obsv0, ids, args.windows,
                                             r, cfg))
    try:
        tic = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(1))
        float(jnp.sum(out))
        first = time.perf_counter() - tic
        best = float("inf")
        for _ in range(3):
            tic = time.perf_counter()
            out = fn(params, jax.random.PRNGKey(1))
            float(jnp.sum(out))
            best = min(best, time.perf_counter() - tic)
    except Exception as e:
        return {"n": n, "pallas_decode": pallas_decode, "ok": False,
                "error": str(e)[:200]}
    steps = n * args.windows * 12
    return {"n": n, "pallas_decode": pallas_decode, "ok": True,
            "time_s": round(best, 4), "compile_s": round(first - best, 1),
            "agent_steps_per_sec": round(steps / best, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10240,102400")
    ap.add_argument("--max-scene-size", type=int, default=64)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--no-pallas-attention", action="store_true")
    args = ap.parse_args()

    for s in args.sizes.split(","):
        for pd in (False, True):
            print(json.dumps(bench(int(s), pd, args)), flush=True)


if __name__ == "__main__":
    main()
