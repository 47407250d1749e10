"""Forward social-attention kernel tile-shape A/B (ROADMAP kernel item).

Times a device-side scan of the Pallas forward at several (ti, tj) tile
shapes, plus the layer-1-as-VPU-FMA variant already in _pair_embed, to
settle the "tj=128-lane-native layout" question with measurements.

Usage:
    python benchmarks/attention_tile_ab.py --sizes 4096,10240 --scene 64 \
        --tiles 128x64,64x128,128x32,64x64 --steps 50
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench(n, scene, ti, tj, steps, dtype, chunks=1):
    import jax
    import jax.numpy as jnp
    from socialways_tpu.kernels.social_attention import _pallas_forward
    from benchmarks.attention_bwd_bench import setup

    p, x4, h, ids = setup(n, scene)
    if dtype == "bf16":
        h = h.astype(jnp.bfloat16)

    @jax.jit
    def run(p, x4, h, ids):
        def body(c, _):
            out = _pallas_forward(p, x4, h, ids, ti=ti, tj=tj,
                                  mlp_chunks=chunks)
            return c + jnp.sum(out.astype(jnp.float32)), 0
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              None, length=steps)
        return acc

    try:
        tic = time.perf_counter()
        float(run(p, x4, h, ids))
        compile_and_first = time.perf_counter() - tic
        tic = time.perf_counter()
        float(run(p, x4, h, ids))
        elapsed = time.perf_counter() - tic
    except Exception as e:
        return {"ok": False, "error": str(e)[:300]}
    return {"ok": True, "ms_per_fwd": round(elapsed / steps * 1e3, 3),
            "compile_s": round(compile_and_first - elapsed, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,10240")
    ap.add_argument("--scene", type=int, default=64)
    ap.add_argument("--tiles", default="128x64,64x128,128x32,64x64")
    ap.add_argument("--dtypes", default="f32")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    results = {}
    for n in [int(s) for s in args.sizes.split(",")]:
        for tile in args.tiles.split(","):
            # "TIxTJ" or "TIxTJcC" (C = mlp_chunks, e.g. 128x128c2)
            spec, chunks = (tile.split("c") + ["1"])[:2]
            ti, tj = [int(x) for x in spec.split("x")]
            for dt in args.dtypes.split(","):
                key = f"n{n}/{tile}/{dt}"
                results[key] = bench(n, args.scene, ti, tj, args.steps,
                                     dt, int(chunks))
                print(key, results[key], flush=True)
                if args.out:
                    with open(args.out, "w") as fh:
                        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
