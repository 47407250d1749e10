"""Diagnose the transient global one-mode coverage drops in agent-frame
runs (VERDICT-r3 weak #6 / next #4).

The af recipes occasionally lose ONE turn mode globally for a single eval
and recover by the next (e.g. coverage 1.00 → 0.68 → 1.00 in the r3/r4
ensemble curves).  Two candidate mechanisms:

- G-side code remap: the InfoGAN code→mode assignment migrates (a code's
  argmax mode changes); during the handover two codes cover the same mode
  and one mode is orphaned.
- D-side margin collapse: D's real/fake margin spikes, the G gradient
  through the LSGAN fooling term swamps the info term, and G momentarily
  merges two modes (codes intact).

This driver trains the documented af recipe with FREQUENT evals and logs,
per eval block:

- toy mode coverage (the headline statistic, same math as eval.stats);
- per-code mode histograms from FORCED-code rollouts (code c one-hot in
  the first n_latent_codes noise dims, matching engine.losses.sample_noise)
  → code→mode argmax map + per-mode total mass;
- D margins: mean D(real), mean D(fake) labels on the eval slice
  (canonical frames — the space D trains in);
- Q-head consistency: argmax Q(G(z, c)) == c rate.

A dip eval is then classified: "code_remap" when the code→mode argmax map
changed vs the previous eval, "mode_starved" when the map is intact but a
mode's sample mass collapses, with the D margin curve alongside.

Usage:
    python benchmarks/dip_diagnosis.py --toy big --seed 3 --steps 40000 \
        --block 500 --out benchmarks/dip_diagnosis_r4_big_s3.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

TOYS = {
    "small": dict(n_conditions=6, n_samples=216, n_per_batch=6),
    "big": dict(n_conditions=8, n_samples=768, n_per_batch=8),
}

N_MODES = 3   # toy turn modes; classification itself lives in eval.stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toy", default="big", choices=list(TOYS))
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--steps", type=int, default=40000)
    ap.add_argument("--block", type=int, default=500,
                    help="GAN steps between diagnostic evals")
    ap.add_argument("--k", type=int, default=20,
                    help="rollouts per forced code per eval")
    ap.add_argument("--test-slice", type=int, default=384)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--overrides", default="{}",
                    help="TrainConfig overrides on top of the af recipe")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from socialways_tpu.config import TrainConfig
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.data.toy import make_toy_npz_arrays
    from socialways_tpu.engine.trainer import Trainer
    from socialways_tpu.engine.train_step import eval_params
    from socialways_tpu.eval.metrics import k_sample_rollout
    from socialways_tpu.eval.stats import toy_mode_coverage, toy_turn_modes
    from socialways_tpu.models.discriminator import discriminator_apply
    from socialways_tpu.models.generator import (decode_rollout,
                                                 prepare_rollout)
    from socialways_tpu.ops.traj import (agent_frame_of,
                                         canonicalize_for_rollout,
                                         from_agent_frame_4d, get_traj_4d,
                                         to_agent_frame)

    with tempfile.TemporaryDirectory(prefix="dipdiag_") as td:
        npz = os.path.join(td, "toy.npz")
        np.savez(npz, **make_toy_npz_arrays(**TOYS[args.toy]))
        ds = load_npz_dataset(npz)

    # documented af recipe: robust1 (categorical 3 codes, lr_d 5e-4,
    # d-lr decay 0.7/10k) + inoise2 + agent_frame; big toy adds info 2.0
    # in the r3 tables but the 8-seed protocol arm ran info 1.0 — keep 1.0
    base = dict(batch_size=256, n_unrolling_steps=1, lr_d=5e-4,
                latent_code_type="categorical", n_latent_codes=3,
                loss_info_w=1.0, d_lr_decay_rate=0.7, d_lr_decay_steps=10000,
                d_input_noise=0.05, d_input_noise_steps=args.steps,
                agent_frame=True, seed=args.seed)
    base.update(json.loads(args.overrides))
    cfg = TrainConfig(**base)
    trainer = Trainer(cfg, ds)
    cfg = trainer.cfg          # n_past/n_next now set from the data
    state = trainer.init_state()
    rng = jax.random.PRNGKey(args.seed)

    nt = ds.n_train_samples
    n_eval = min(args.test_slice, len(ds.obsvs) - nt)
    obs = jnp.asarray(ds.obsvs[nt:nt + n_eval])
    pred_gt = jnp.asarray(ds.preds[nt:nt + n_eval])
    # real test scene structure — a zeros placeholder would pool social
    # attention over ONE giant scene (the round-4 coverage-eval bug)
    ids = jnp.asarray(ds.scene_ids_for_rows(nt, n_eval))
    obs_w = ds.scale.denormalize(np.asarray(obs))     # world, for classify
    n_codes = cfg.n_latent_codes

    def forced_code_rollouts(g_params, key):
        """Rollouts with the categorical code FORCED per leading index
        (sample_noise layout: one-hot in the first n_codes dims, uniform
        elsewhere).  Returns (model-frame [n_codes, K, N, T, 4] — the
        exact tensors D sees in training — world-frame same shape, noise).

        Mirrors eval.metrics.k_sample_rollout's agent_frame × use_social
        composition: pairwise social geometry from WORLD-frame last-obs
        states, encode/decode I/O per-agent canonical."""
        z = jax.random.uniform(key, (n_codes, args.k, n_eval,
                                     cfg.noise_len), obs.dtype)
        eye = jnp.eye(n_codes, dtype=obs.dtype)
        z = jnp.concatenate(
            [jnp.broadcast_to(eye[:, None, None, :],
                              (n_codes, args.k, n_eval, n_codes)),
             z[..., n_codes:]], axis=-1)
        obs_in, frame, social_x4 = canonicalize_for_rollout(
            obs, cfg.agent_frame, cfg.use_social)
        prep = prepare_rollout(g_params, obs_in, ids, cfg.use_social,
                               cfg.use_pallas, cfg.max_scene_size,
                               social_states=social_x4)
        out_m = jax.vmap(jax.vmap(
            lambda zz: decode_rollout(g_params, prep, zz, cfg.n_next,
                                      cfg.decoder)))(z)
        out_w = (from_agent_frame_4d(out_m, frame) if frame is not None
                 else out_m)
        return out_m, out_w, z

    def d_margins(st, key):
        """Mean D(real), D(fake) labels + Q accuracy on the eval slice, in
        the coordinates D trains in (canonical under agent_frame)."""
        if cfg.agent_frame:
            frame = agent_frame_of(obs)
            obs_c = to_agent_frame(obs, frame)
            pred_c = to_agent_frame(pred_gt, frame)
        else:
            obs_c, pred_c = obs, pred_gt
        obsv_4d, pred_4d = get_traj_4d(obs_c, pred_c)
        out_m, out_w, z = forced_code_rollouts(eval_params(st), key)
        fake_4d = out_m.reshape(-1, cfg.n_next, 4)
        obsv_4d_rep = jnp.tile(obsv_4d, (n_codes * args.k, 1, 1))
        real_lbl, _ = discriminator_apply(st.d_params, obsv_4d, pred_4d)
        fake_lbl, code_hat = discriminator_apply(st.d_params, obsv_4d_rep,
                                                 fake_4d)
        code_true = jnp.argmax(
            z[..., :n_codes].reshape(-1, n_codes), axis=-1)
        q_acc = jnp.mean(
            (jnp.argmax(code_hat, axis=-1) == code_true)
            .astype(jnp.float32))
        return (jnp.mean(real_lbl), jnp.mean(fake_lbl), q_acc, out_w)

    margins_fn = jax.jit(d_margins)

    spe = trainer.n_steps_per_epoch
    block_epochs = max(args.block // spe, 1)
    total_epochs = max(args.steps // spe, 1)

    records = []
    prev_map = None
    done = 0
    tic = time.perf_counter()
    while done < total_epochs:
        n = min(block_epochs, total_epochs - done)
        rng, sub = jax.random.split(rng)
        state, _ = trainer.train_epochs(state, sub, n)
        done += n

        rng, k1, k2 = jax.random.split(rng, 3)
        gp = eval_params(state)
        pk = k_sample_rollout(gp, obs, ids, k1, 20, cfg)
        cov = toy_mode_coverage(
            obs_w, ds.scale.denormalize(np.asarray(pk[..., :2])))
        real_m, fake_m, q_acc, rolls = margins_fn(state, k2)
        finals = ds.scale.denormalize(
            np.asarray(rolls[..., :2]))[..., -1, :]   # [codes, K, N, 2]
        modes = toy_turn_modes(obs_w, finals)         # [codes, K, N]
        hist = np.zeros((n_codes, N_MODES + 1), np.int64)
        for c in range(n_codes):
            vals, cnts = np.unique(modes[c], return_counts=True)
            for v, ct in zip(vals, cnts):
                hist[c, v if v >= 0 else N_MODES] = ct
        code_map = hist[:, :N_MODES].argmax(axis=1).tolist()
        mode_mass = hist[:, :N_MODES].sum(axis=0)
        mode_share = (mode_mass / max(mode_mass.sum(), 1)).round(4).tolist()
        rec = {
            "step": done * spe,
            "coverage": round(float(cov), 4),
            "d_real_mean": round(float(real_m), 4),
            "d_fake_mean": round(float(fake_m), 4),
            "d_margin": round(float(real_m - fake_m), 4),
            "q_acc": round(float(q_acc), 4),
            "code_map": code_map,
            "code_remap": bool(prev_map is not None
                               and code_map != prev_map),
            "mode_share": mode_share,
            "min_mode_share": round(float(min(mode_share)), 4),
            "hist": hist.tolist(),
        }
        prev_map = code_map
        records.append(rec)
        print({k: rec[k] for k in ("step", "coverage", "d_margin", "q_acc",
                                   "code_map", "code_remap",
                                   "min_mode_share")}, flush=True)

    # post-hoc dip classification
    covs = [r["coverage"] for r in records]
    dips = [i for i in range(1, len(covs))
            if covs[i] < 0.85 and covs[i - 1] >= 0.95]
    for i in dips:
        r = records[i]
        r["dip"] = True
        r["dip_kind"] = ("code_remap" if (r["code_remap"]
                                          or (i + 1 < len(records)
                                              and records[i + 1]
                                              ["code_remap"]))
                         else "mode_starved")
    out = {
        "toy": args.toy, "seed": args.seed, "steps": args.steps,
        "block": args.block, "k_per_code": args.k,
        "overrides": json.loads(args.overrides),
        "wall_s": round(time.perf_counter() - tic, 1),
        "n_dips": len(dips),
        "dip_steps": [records[i]["step"] for i in dips],
        "dip_kinds": [records[i]["dip_kind"] for i in dips],
        "records": records,
    }
    print(json.dumps({k: out[k] for k in ("n_dips", "dip_steps",
                                          "dip_kinds", "wall_s")}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
