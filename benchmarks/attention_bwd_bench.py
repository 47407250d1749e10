"""Social-attention fwd+bwd benchmark: Pallas kernels vs XLA fallbacks.

Times a device-side scan of value_and_grad through the attention (the
TRAINING-path shape of the op) for each implementation × dtype:

- pallas:   social_attention_fused (flash-style dq/dkv backward kernels;
            round-2 session-3 made the backward bf16-consistent, so bf16
            now takes the kernels instead of the blockwise fallback)
- windowed: ops.social.social_context_windowed under jax.vjp (linear
            O(N·max_scene) XLA form)
- blockwise: ops.social.social_context_blockwise under jax.vjp (the old
            bf16 fallback)

All timings force a host transfer (axon block_until_ready returns early).

Usage:
    python benchmarks/attention_bwd_bench.py --sizes 4096,8192 \
        --scene 64 --steps 20 --out benchmarks/attention_bwd_bench.json
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def setup(n, scene, hidden=64):
    import jax
    import jax.numpy as jnp
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.models import init_generator

    cfg = TrainConfig(hidden_size=hidden, social_feature_size=hidden,
                      noise_len=hidden // 2)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}
    rng = np.random.RandomState(0)
    x4 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(n, hidden).astype(np.float32))
    ids = jnp.asarray((np.arange(n) // scene).astype(np.int32))
    return p, x4, h, ids


def bench(impl, dtype, n, scene, steps):
    import jax
    import jax.numpy as jnp
    from socialways_tpu.kernels import social_attention as sa
    from socialways_tpu.ops import social as social_xla

    p, x4, h, ids = setup(n, scene)
    if dtype == "bf16":
        p = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
        x4 = x4.astype(jnp.bfloat16)
        h = h.astype(jnp.bfloat16)

    if impl == "pallas":
        fn = lambda pp, hh: sa.social_attention_fused(pp, x4, hh, ids)
    elif impl == "windowed":
        fn = lambda pp, hh: social_xla.social_context_windowed(
            pp, x4, hh, ids, max_scene=scene)
    elif impl == "blockwise":
        fn = lambda pp, hh: social_xla.social_context_blockwise(
            pp, x4, hh, ids, block=256)
    else:
        raise ValueError(impl)

    def loss(pp, hh):
        return jnp.sum(fn(pp, hh).astype(jnp.float32))

    @jax.jit
    def run(pp, hh):
        def body(c, _):
            l, (gp, gh) = jax.value_and_grad(loss, argnums=(0, 1))(pp, hh)
            leaves = [jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree_util.tree_leaves(gp)]
            return c + l + sum(leaves) + jnp.sum(gh.astype(jnp.float32)), 0
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              None, length=steps)
        return acc

    try:
        tic = time.perf_counter()
        float(run(p, h))
        compile_and_first = time.perf_counter() - tic
        tic = time.perf_counter()
        float(run(p, h))
        elapsed = time.perf_counter() - tic
    except Exception as e:
        return {"ok": False, "error": str(e)[:300]}
    return {"ok": True, "ms_per_fwdbwd": round(elapsed / steps * 1e3, 2),
            "compile_s": round(compile_and_first - elapsed, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,8192")
    ap.add_argument("--scene", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--impls", default="pallas,windowed,blockwise")
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    results = {}
    for n in [int(s) for s in args.sizes.split(",")]:
        for impl in args.impls.split(","):
            for dt in args.dtypes.split(","):
                key = f"{impl}/{dt}/n{n}"
                results[key] = bench(impl, dt, n, args.scene, args.steps)
                print(key, results[key], flush=True)
                if args.out:
                    with open(args.out, "w") as fh:
                        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
