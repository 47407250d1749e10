"""Crowd-simulation A/B: agent-frame canonicalization cost at scale.

The round-4 flagship configuration composes agent-centric canonical
frames with social attention.  In crowd_simulate the canonicalization is
an elementwise O(N) transform fused into the per-window device program;
this A/B measures its cost against the plain world-frame simulation at
crowd scale (windowed O(N·max_scene) attention, the production path).

Usage:
    python benchmarks/crowd_sim_af_ab.py --agents 131072 --windows 4 \
        --out benchmarks/crowd_sim_af_ab_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=131072)
    ap.add_argument("--scene-size", type=int, default=16)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from socialways_tpu.config import TrainConfig
    from socialways_tpu.engine.simulate import crowd_simulate
    from socialways_tpu.models.generator import init_generator

    n, ss = args.agents, args.scene_size
    rng = np.random.RandomState(0)
    obsv0 = jnp.asarray(rng.rand(n, 8, 2).astype(np.float32))
    ids = jnp.asarray((np.arange(n) // ss).astype(np.int32))

    result = {"agents": n, "scene_size": ss, "windows": args.windows}
    for name, af in (("world", False), ("agent_frame", True)):
        cfg = TrainConfig(n_past=8, n_next=12, use_social=True,
                          agent_frame=af, max_scene_size=ss)
        params = init_generator(jax.random.PRNGKey(0), cfg)
        fn = jax.jit(lambda p, o, i, k: crowd_simulate(
            p, o, i, args.windows, k, cfg))
        # precompute keys — per-rep PRNGKey construction inside the timed
        # loop floods the axon tunnel (CLAUDE.md environment rules)
        keys = [jax.random.PRNGKey(2 + r) for r in range(args.reps)]
        tic = time.perf_counter()
        out = fn(params, obsv0, ids, jax.random.PRNGKey(1))
        float(jnp.sum(out))                       # axon: force host sync
        compile_s = time.perf_counter() - tic
        tic = time.perf_counter()
        for r in range(args.reps):
            out = fn(params, obsv0, ids, keys[r])
            float(jnp.sum(out))
        per = (time.perf_counter() - tic) / args.reps
        steps = n * args.windows * cfg.n_next
        result[name] = {
            "compile_s": round(compile_s, 1),
            "sim_s": round(per, 4),
            "agent_steps_per_sec": round(steps / per, 1),
        }
        print(name, result[name], flush=True)

    result["af_overhead_pct"] = round(
        100.0 * (result["agent_frame"]["sim_s"] / result["world"]["sim_s"]
                 - 1.0), 2)
    print(json.dumps({"af_overhead_pct": result["af_overhead_pct"]}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
