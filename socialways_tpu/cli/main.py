"""Command-line entry points.

Replaces the reference's run-at-import script (train.py) with subcommands:

    python -m socialways_tpu.cli.main create-toy --npz toy.npz
    python -m socialways_tpu.cli.main create-dataset obsmat.txt out.npz
    python -m socialways_tpu.cli.main train --data toy.npz --epochs 100
    python -m socialways_tpu.cli.main evaluate --data toy.npz --model ckpt.npz
    python -m socialways_tpu.cli.main visualize --preds-dir dumps/ --out out.png

Every hard-coded constant of the reference (train.py:53-84) is a flag here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


#: Documented flag bundles (BASELINE.md recipes).  --recipe NAME expands
#: to these tokens right after the subcommand, so any explicit flag given
#: later on the command line OVERRIDES the recipe (argparse last-wins).
_RECIPES = {
    # categorical codes + cooled D + divergence rescue
    "robust1": ["--latent-code", "categorical", "--n-latent-codes", "3",
                "--d-lr", "5e-4", "--info-weight", "1.0",
                "--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000",
                "--auto-recover"],
}
# robust1 + annealed D instance noise over the whole run
_RECIPES["inoise2"] = _RECIPES["robust1"] + [
    "--d-input-noise", "0.05", "--d-input-noise-steps", "-1"]
# the round-4 TOY production stack: canonical frames + the paper's social
# attention + EMA generator on top of inoise2.  Named toy-flagship since
# round 5: its categorical/cooled-D/info-1.0 hyperparameters measured
# 6.4-6.8x WORSE than reference defaults on the ETH/UCY LOO protocol
# (BASELINE.md r4m) — it is the flagship of the TOY protocol only.
_RECIPES["toy-flagship"] = _RECIPES["inoise2"] + [
    "--agent-frame", "--use-social", "--g-ema-decay", "0.999"]
# the record LOO/real-data arm (BASELINE.md r5 8-seed matrix:
# mean 0.0717/0.0881, best seed 0.0637/0.0756):
# af + social + EMA + annealed D instance noise with a 0.02 floor +
# graced ADE-stall rescue, on otherwise reference-default training
# hyperparameters (NO categorical codes / D-lr cooling — those are the
# toy bundle the r4m A/B measured 6.4x worse here)
_RECIPES["loo"] = [
    "--agent-frame", "--use-social", "--g-ema-decay", "0.999",
    "--d-input-noise", "0.05", "--d-input-noise-steps", "-1",
    "--d-input-noise-floor", "0.02",
    # gated rescue (r5 8-seed matrix: mean 0.0657 vs always-policy
    # 0.0717, worst seed 0.0686 vs 0.0921; every patience-fired rescue
    # measured was a false positive) — fire ONLY on a matched stall
    # signature (broad-under-fit or diversity-collapse)
    "--ade-stall-recover", "-1", "--ade-stall-classify", "5"]

#: deprecated names -> replacement (expanded with a stderr note)
_RECIPE_ALIASES = {"flagship": "toy-flagship"}


def _apply_recipe(argv):
    """Expand ``--recipe NAME`` (or ``--recipe=NAME``) into its flag
    bundle, inserted right after the subcommand so later explicit flags
    override it.  A recipe's store_true flags (e.g. --auto-recover)
    cannot be switched back off by a later flag — use a thinner recipe
    plus explicit flags instead.  Unknown names are left for argparse's
    choices= error.  ``eth-ucy`` defaults to the ``loo`` record arm when
    no --recipe is given (opt out with ``--recipe=``)."""
    argv = list(argv)
    # the bundle must land right after the SUBCOMMAND, which the global
    # flags (--cpu, --cpu-devices N) may precede
    sub_i = 0
    while sub_i < len(argv):
        tok = argv[sub_i]
        if tok == "--cpu-devices":
            sub_i += 2
        elif tok.startswith("-"):
            sub_i += 1
        else:
            break
    for i, tok in enumerate(argv):
        if tok == "--recipe" and i + 1 < len(argv):
            name, rest = argv[i + 1], argv[:i] + argv[i + 2:]
        elif tok.startswith("--recipe="):
            name, rest = tok.split("=", 1)[1], argv[:i] + argv[i + 1:]
        else:
            continue
        if name in _RECIPE_ALIASES:
            new = _RECIPE_ALIASES[name]
            print(f"NOTE: --recipe {name} is deprecated — it is the TOY "
                  f"bundle (6.4x worse than defaults on the LOO protocol, "
                  f"BASELINE.md r4m); renamed to '{new}'. For real "
                  f"trajectory data use --recipe loo.", file=sys.stderr)
            name = new
        if name not in _RECIPES:
            return argv
        return rest[:sub_i + 1] + _RECIPES[name] + rest[sub_i + 1:]
    if sub_i < len(argv) and argv[sub_i] == "eth-ucy":
        # the LOO protocol defaults to its own record arm — the measured
        # best configuration for exactly this benchmark (BASELINE.md r4l)
        print("NOTE: eth-ucy defaults to --recipe loo (the record arm: "
              "af+social+EMA+noise-floor+gated rescue); pass --recipe= "
              "for bare reference-default hyperparameters",
              file=sys.stderr)
        return argv[:sub_i + 1] + _RECIPES["loo"] + argv[sub_i + 1:]
    return argv


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--recipe", default="",
                   choices=[""] + list(_RECIPES) + list(_RECIPE_ALIASES),
                   help="expand a documented BASELINE.md flag bundle. "
                        "REAL DATA: 'loo' = the record LOO arm "
                        "(--agent-frame --use-social --g-ema-decay 0.999 "
                        "+ annealed D instance noise with 0.02 floor + "
                        "signature-GATED ADE-stall rescue; 8-seed LOO "
                        "mean 0.0657/0.0774, worst seed 0.0686, "
                        "BASELINE.md r5) — the "
                        "default for eth-ucy. TOY protocol: robust1 = "
                        "categorical codes + cooled D + auto-recover; "
                        "inoise2 = + annealed D instance noise; "
                        "toy-flagship = + af/social/EMA (NOT for "
                        "trajectory data: its hyperparameters measured "
                        "6.4-6.8x worse than defaults on the LOO "
                        "protocol, r4m A/B). Explicit flags given AFTER "
                        "--recipe override the bundle")
    p.add_argument("--batch-size", "--b", type=int, default=256)
    p.add_argument("--epochs", "--e", type=int, default=1000)
    p.add_argument("--model", "--m", default="socialWays",
                   choices=["socialWays"])
    p.add_argument("--latent-dim", "--ld", type=int, default=10)
    p.add_argument("--d-learning-rate", "--d-lr", type=float, default=1e-3)
    p.add_argument("--g-learning-rate", "--g-lr", type=float, default=1e-4)
    p.add_argument("--unrolling-steps", "--unroll", type=int, default=1)
    p.add_argument("--hidden-size", "--h-size", type=int, default=64)
    p.add_argument("--dataset", "--data-name", default="hotel")
    # the reference's hard-coded FIXME block, exposed:
    p.add_argument("--use-social", action="store_true",
                   help="enable the social attention pooling (the paper's "
                        "mechanism; OFF by default like the reference)")
    p.add_argument("--agent-frame", action="store_true",
                   help="train/predict in per-agent canonical heading "
                        "frames (rollouts map back to world at eval; "
                        "composes with --use-social — pairwise social "
                        "geometry stays world-frame)")
    p.add_argument("--no-info-loss", action="store_true")
    p.add_argument("--info-weight", type=float, default=0.5)
    p.add_argument("--info-weight-end", type=float, default=0.0,
                   help="ramp the info weight linearly from --info-weight "
                        "to this over --info-weight-steps GAN steps — "
                        "anchors the code-to-mode assignment harder as "
                        "training progresses (the measured dip mechanism "
                        "is a G-side code remap; benchmarks/dip_diagnosis*)"
                        " (0 = constant, reference parity)")
    p.add_argument("--info-weight-steps", type=int, default=0)
    p.add_argument("--n-latent-codes", type=int, default=2)
    p.add_argument("--latent-code", default="continuous",
                   choices=["continuous", "categorical"],
                   help="InfoGAN code type: continuous (reference parity, "
                        "MSE Q-loss on the first noise dims) or categorical "
                        "(one-hot code + cross-entropy Q-loss — better for "
                        "discretely multi-modal data)")
    p.add_argument("--use-l2-loss", action="store_true")
    p.add_argument("--use-variety-loss", action="store_true")
    p.add_argument("--l2-weight", type=float, default=0.5)
    p.add_argument("--decoder", default="fc", choices=["fc", "lstm"])
    p.add_argument("--d-restore", default="full",
                   choices=["full", "reference", "none"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-gen-samples", "--k", type=int, default=20)
    p.add_argument("--test-interval", type=int, default=5)
    p.add_argument("--save-interval", type=int, default=50)
    p.add_argument("--model-dir", default="trained_models")
    p.add_argument("--dump-dir", default="")
    p.add_argument("--lnr-model", default="cv", choices=["cv", "kalman"],
                   help="linear baseline written to dumps' preds_lnr "
                        "(cv = reference parity)")
    p.add_argument("--host-loop", action="store_true",
                   help="per-chunk host loop instead of epoch-on-device")
    p.add_argument("--bf16", action="store_true",
                   help="run generator/discriminator forward math in "
                        "bfloat16 on the MXU (f32 master params, f32 "
                        "losses); float32 remains the parity default")
    p.add_argument("--pallas", action="store_true",
                   help="use the fused Pallas kernels (TPU only; long "
                        "first compile)")
    p.add_argument("--track-coverage", action="store_true",
                   help="also track toy mode coverage at each eval and "
                        "keep the best-coverage checkpoint (-bestcov.npz)")
    p.add_argument("--auto-recover", action="store_true",
                   help="on training divergence (NaN or ADE >5x best), "
                        "restore the best checkpoint and continue")
    p.add_argument("--stall-recover", type=int, default=0,
                   help="with --track-coverage: after N consecutive "
                        "coverage evals without a new best, restore the "
                        "best-coverage checkpoint and continue on the "
                        "(fresh) RNG stream — random-restart hill "
                        "climbing on mode coverage (0 = off)")
    p.add_argument("--stall-reset-d", action="store_true",
                   help="with --stall-recover: also re-initialize the "
                        "discriminator (params + optimizer) on each "
                        "stall rescue — a fresh adversarial landscape "
                        "can push a collapsed code-to-mode mapping out "
                        "of its basin (D is small and relearns fast)")
    p.add_argument("--ade-stall-recover", type=int, default=0,
                   help="after N consecutive evals without a >2%% "
                        "improvement of the best min-K ADE, restore the "
                        "best checkpoint and re-initialize the "
                        "discriminator (params + optimizer) — the "
                        "--stall-reset-d mechanism keyed on eval ADE "
                        "instead of toy coverage, for non-toy data where "
                        "coverage is undefined (0 = off; -1 = arm the "
                        "rescue but fire ONLY on the "
                        "--ade-stall-classify signature — the gated "
                        "policy that won every r5 A/B seed)")
    p.add_argument("--ade-stall-grace", type=int, default=2,
                   help="post-rescue grace: skip ADE-stall counting for "
                        "G evals after each rescue — G re-trains against "
                        "the fresh random D for a while and the measured "
                        "transient doubles ADE for 1-2 eval blocks before "
                        "recovery (counting those re-fires the rescue "
                        "mid-recovery)")
    p.add_argument("--ade-stall-max-rescues", type=int, default=3,
                   help="stop ADE-stall rescuing once M consecutive "
                        "rescues produce no new global best (the first "
                        "rescue is never counted — no prior rescue to "
                        "judge — so up to M+1 rescues can fire per "
                        "stall episode; each ineffective rescue costs "
                        "a transient; 0 = unlimited)")
    p.add_argument("--ade-stall-classify", type=int, default=0,
                   help="signature-matched EARLY rescue: fire after N "
                        "consecutive flat evals matching a measured "
                        "stall signature — broad-under-fit (avg-of-K "
                        "ADE >=3x the min-of-K with train ADE tracking "
                        "the avg; benchmarks/stall_diagnosis_r4m) or "
                        "diversity-collapse (avg-of-K <=1.2x min-of-K, "
                        "the K samples near-identical; the r5 "
                        "seed-9/eth mechanism) — instead of waiting "
                        "out the full --ade-stall-recover patience; "
                        "works standalone (without --ade-stall-recover "
                        "it arms the gated rescue by itself). Healthy "
                        "folds (avg/min 1.3-3.4x) match neither. "
                        "0 = patience-only")
    p.add_argument("--rescue-keep-clock", action="store_true",
                   help="checkpoint-restore rescues (--auto-recover, "
                        "--stall-recover) keep the optimizer step counts "
                        "on the monotonic wall clock instead of rewinding "
                        "them — count-keyed schedules (--d-input-noise "
                        "anneal, lr decay, --d-update-every switch) "
                        "continue forward across a restore, so rescues "
                        "compose with an active anneal")
    p.add_argument("--r1-gamma", type=float, default=0.0,
                   help="R1 gradient penalty weight on the real-data D "
                        "output (0 = off, reference behavior; a GAN "
                        "stability knob)")
    p.add_argument("--noise-dist", default="uniform",
                   choices=["uniform", "gaussian"],
                   help="generator noise distribution (the reference uses "
                        "U(0,1), torch.rand at train.py:473)")
    p.add_argument("--d-input-noise", type=float, default=0.0,
                   help="D instance noise: Gaussian std added to the "
                        "prediction inputs of every D evaluation (fake "
                        "and real), a classic support-overlap stabilizer "
                        "(0 = off, reference behavior)")
    p.add_argument("--d-input-noise-steps", type=int, default=0,
                   help="anneal --d-input-noise linearly to 0 over this "
                        "many GAN steps (0 = constant; -1 = the whole "
                        "planned run, epochs x chunks)")
    p.add_argument("--d-input-noise-floor", type=float, default=0.0,
                   help="clamp the annealed noise std from below: early "
                        "training gets the full ramp, late training "
                        "keeps this constant floor (prevents late "
                        "D-overfit divergence on hard folds — BASELINE.md "
                        "LOO stabilizer A/B; ignored without an anneal)")
    p.add_argument("--pac", type=int, default=1,
                   help="PacGAN: the LSGAN classifier scores packs of "
                        "this many consecutive samples (one label per "
                        "pack) so mode collapse is directly visible to "
                        "D; the InfoGAN Q-head stays per-sample (1 = "
                        "off, reference parity)")
    p.add_argument("--spectral-norm", action="store_true",
                   help="SN-GAN: spectrally normalize D's feed-forward "
                        "Linear weights at every evaluation (stateless "
                        "power iteration; Q-head and LSTM untouched) — "
                        "bounds D's Lipschitz constant (off = reference "
                        "parity)")
    p.add_argument("--mb-std", action="store_true",
                   help="ProGAN minibatch stddev: append the fake/real "
                        "block's diversity scalar to D's classifier input "
                        "— D detects mode collapse directly and G gets "
                        "gradient pressure toward diversity (off = "
                        "reference parity)")
    p.add_argument("--ms-weight", type=float, default=0.0,
                   help="MSGAN mode-seeking regularizer weight: the G "
                        "loss adds w/(r+1e-5) with r = output-diversity / "
                        "latent-distance between two noise draws — direct "
                        "anti-collapse pressure on G; costs one extra "
                        "rollout per step (0 = off, reference parity)")
    p.add_argument("--ds-weight", type=float, default=0.0,
                   help="DSGAN diversity hinge weight: per-sample "
                        "max(0, tau - d_i/dz_i) over a second rollout — "
                        "each collapsed condition-mode pays the full "
                        "hinge (sharper than the global --ms-weight "
                        "ratio); bounded, goes silent above --ds-tau "
                        "(0 = off, reference parity)")
    p.add_argument("--ds-tau", type=float, default=1.0,
                   help="diversity-ratio target for --ds-weight")
    p.add_argument("--ds-k", type=int, default=2,
                   help="rollouts pooled by the diversity regularizers "
                        "(d_i/dz_i = mean over all K(K-1)/2 pairs; K-1 "
                        "extra rollouts — K=4 separates per-condition "
                        "collapse from legitimate same-mode pairs)")
    p.add_argument("--lr-decay-rate", type=float, default=1.0,
                   help="staircase exponential lr decay factor for both "
                        "optimizers (1.0 = constant, reference behavior)")
    p.add_argument("--lr-decay-steps", type=int, default=0,
                   help="optimizer updates per decay stair")
    p.add_argument("--d-lr-decay-rate", type=float, default=1.0,
                   help="D-ONLY staircase lr decay factor (overrides the "
                        "shared schedule for D; cools the discriminator "
                        "while G keeps learning)")
    p.add_argument("--d-lr-decay-steps", type=int, default=0,
                   help="optimizer updates per D-only decay stair")
    p.add_argument("--d-update-every", type=int, default=1,
                   help="run the D phase only on every k-th GAN step "
                        "(skipped steps leave D untouched and train G "
                        "against the current D; 1 = reference parity)")
    p.add_argument("--d-update-every-end", type=int, default=0,
                   help="warmup-style D/G ratio schedule: switch "
                        "--d-update-every to this value after "
                        "--d-update-every-switch steps (0 = constant)")
    p.add_argument("--d-update-every-switch", type=int, default=0,
                   help="G-step count at which the D/G ratio switches")
    p.add_argument("--lr-warmup-steps", type=int, default=0,
                   help="linear lr warmup over the first N optimizer "
                        "updates, both optimizers (0 = off)")
    p.add_argument("--d-lr-warmup-steps", type=int, default=0,
                   help="D-only lr warmup override (0 = use "
                        "--lr-warmup-steps)")
    p.add_argument("--g-ema-decay", type=float, default=0.0,
                   help="EMA of generator params (e.g. 0.999); eval, "
                        "dumps, and best-checkpoint selection use the EMA "
                        "generator (0 = off)")
    p.add_argument("--grad-clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off, reference "
                        "behavior; 1.0 recommended for long runs)")
    p.add_argument("--profile-dir", default="",
                   help="write jax.profiler device traces for the first "
                        "post-compile epoch to this directory")
    p.add_argument("--metrics-log", default="",
                   help="append one JSON line per train/eval block to this "
                        "file (machine-readable counterpart of the epoch "
                        "prints; the reference logs via print only, "
                        "SURVEY §5.5)")
    p.add_argument("--serial-rollout", action="store_true",
                   help="do not hold the G-rollout backward residuals "
                        "across the D phase (recompute the rollout for "
                        "the G grad): ~2x rollout compute, peak HBM = "
                        "max of phases — for the largest one-chip crowd "
                        "training sizes")
    p.add_argument("--remat-steps", action="store_true",
                   help="rematerialize LSTM/decode steps in training "
                        "(crowd-scale memory saver, needed above ~262k "
                        "agents/chip; slightly slower below)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="exact gradient accumulation over N micro-chunks "
                        "per step (valid-share-weighted; equals the "
                        "full-batch gradient). Peak HBM shrinks to one "
                        "chunk's residuals — the lever past the 524k "
                        "one-chip crowd-training wall. Batch rows must "
                        "divide by N and (with --use-social) scene "
                        "boundaries must align to chunk boundaries")
    p.add_argument("--max-scene-size", type=int, default=0,
                   help="static bound on agents-per-scene (ids sorted + "
                        "contiguous): unlocks the windowed O(N*max_scene) "
                        "social attention for crowd-scale TRAINING/eval "
                        "(0 = unknown)")
    p.add_argument("--block-size", type=int, default=0,
                   help="fused-epoch block size (0 = gcd of test/save "
                        "intervals). GAN outcomes depend on the RNG "
                        "stream, which depends on this — use the same "
                        "value to reproduce sweep results exactly")
    p.add_argument("--fused-epochs", action="store_true",
                   help="run gcd(test,save)-interval epoch blocks as one "
                        "device program (fastest; per-epoch prints become "
                        "per-block)")
    p.add_argument("--mesh", type=str, default="0",
                   help="data-parallel over the first N devices: chunk "
                        "groups are sharded over a 1-D mesh and every "
                        "step pmeans gradients over ICI; composes with "
                        "--fused-epochs (N groups become one DP step, so "
                        "an epoch has ceil(chunks/N) steps; 0 = off). "
                        "'AxB' (e.g. 2x4) builds the hierarchical "
                        "(dcn, data) mesh instead — A slices of B chips, "
                        "gradient reduction riding ICI within a slice "
                        "and DCN across slices")


def _cfg_from_args(args) -> "TrainConfig":
    from socialways_tpu.config import TrainConfig
    if (getattr(args, "d_lr_decay_rate", 1.0) != 1.0
            and getattr(args, "d_lr_decay_steps", 0) == 0):
        print("WARNING: --d-lr-decay-rate is ignored without "
              "--d-lr-decay-steps > 0 (the D optimizer falls back to the "
              "shared --lr-decay-* schedule)", file=sys.stderr)
    return TrainConfig(
        dataset=args.dataset,
        batch_size=args.batch_size,
        n_epochs=args.epochs,
        lr_g=args.g_learning_rate,
        lr_d=args.d_learning_rate,
        n_unrolling_steps=args.unrolling_steps,
        hidden_size=args.hidden_size,
        social_feature_size=args.hidden_size,
        noise_len=args.hidden_size // 2,
        latent_dim=args.latent_dim,
        use_social=args.use_social,
        agent_frame=getattr(args, "agent_frame", False),
        use_info_loss=not args.no_info_loss,
        loss_info_w=args.info_weight,
        loss_info_w_end=getattr(args, "info_weight_end", 0.0),
        loss_info_w_steps=getattr(args, "info_weight_steps", 0),
        n_latent_codes=args.n_latent_codes,
        latent_code_type=getattr(args, "latent_code", "continuous"),
        noise_dist=getattr(args, "noise_dist", "uniform"),
        r1_gamma=getattr(args, "r1_gamma", 0.0),
        d_input_noise=getattr(args, "d_input_noise", 0.0),
        d_input_noise_steps=getattr(args, "d_input_noise_steps", 0),
        d_input_noise_floor=getattr(args, "d_input_noise_floor", 0.0),
        pac=getattr(args, "pac", 1),
        spectral_norm=getattr(args, "spectral_norm", False),
        mb_std=getattr(args, "mb_std", False),
        ms_weight=getattr(args, "ms_weight", 0.0),
        ds_weight=getattr(args, "ds_weight", 0.0),
        ds_tau=getattr(args, "ds_tau", 1.0),
        ds_k=getattr(args, "ds_k", 2),
        use_l2_loss=args.use_l2_loss,
        use_variety_loss=args.use_variety_loss,
        loss_l2_w=args.l2_weight,
        decoder=args.decoder,
        d_restore=args.d_restore,
        seed=args.seed,
        n_gen_samples=args.n_gen_samples,
        test_interval=args.test_interval,
        save_interval=args.save_interval,
        model_dir=args.model_dir,
        dump_dir=args.dump_dir,
        lnr_model=getattr(args, "lnr_model", "cv"),
        epoch_on_device=not args.host_loop,
        use_pallas=getattr(args, "pallas", False),
        grad_clip=getattr(args, "grad_clip", 0.0),
        lr_decay_rate=getattr(args, "lr_decay_rate", 1.0),
        lr_decay_steps=getattr(args, "lr_decay_steps", 0),
        d_lr_decay_rate=getattr(args, "d_lr_decay_rate", 1.0),
        d_lr_decay_steps=getattr(args, "d_lr_decay_steps", 0),
        d_update_every=getattr(args, "d_update_every", 1),
        d_update_every_end=getattr(args, "d_update_every_end", 0),
        d_update_every_switch=getattr(args, "d_update_every_switch", 0),
        lr_warmup_steps=getattr(args, "lr_warmup_steps", 0),
        d_lr_warmup_steps=getattr(args, "d_lr_warmup_steps", 0),
        g_ema_decay=getattr(args, "g_ema_decay", 0.0),
        max_scene_size=getattr(args, "max_scene_size", 0),
        remat_steps=getattr(args, "remat_steps", False),
        serial_rollout=getattr(args, "serial_rollout", False),
        grad_accum=getattr(args, "grad_accum", 1),
        compute_dtype="bfloat16" if getattr(args, "bf16", False)
        else "float32",
    )


# ------------------------------------------------------------- commands
def cmd_create_toy(args) -> int:
    from socialways_tpu.data.toy import (create_toy_samples,
                                         make_toy_npz_arrays, write_toy_txt)
    arrays = make_toy_npz_arrays(n_samples=args.n_samples,
                                 n_conditions=args.n_conditions,
                                 n_modes=args.n_modes,
                                 n_per_batch=args.n_per_batch,
                                 seed=args.seed)
    if args.npz:
        np.savez(args.npz, **arrays)
        print(f"wrote {args.npz}: obsvs {arrays['obsvs'].shape}, "
              f"{len(arrays['batches'])} scene batches")
    if args.txt:
        rng = np.random.RandomState(args.seed)
        samples, stamps = create_toy_samples(
            args.n_samples, args.n_conditions, args.n_modes,
            args.n_per_batch, rng=rng)
        write_toy_txt(samples, stamps, args.txt)
        print(f"wrote {args.txt}")
    return 0


def cmd_create_dataset(args) -> int:
    from socialways_tpu.data import (BIWIParser, SDDParser, SeyfriedParser,
                                     TrajnetParser, create_dataset)
    parser_cls = {"biwi": BIWIParser, "trajnet": TrajnetParser,
                  "sdd": SDDParser, "seyfried": SeyfriedParser}[args.parser]
    p = parser_cls()
    p.load(args.input, down_sample=args.down_sample)
    if not p.p_data:
        raise SystemExit(f"error: no trajectories parsed from {args.input} "
                         f"with the '{args.parser}' parser — wrong format?")
    interval = p.interval if p.interval > 0 else 1
    t_range = range(int(p.min_t), int(p.max_t), interval)
    obsvs, preds, times, batches = create_dataset(
        p.p_data, p.t_data, t_range, n_past=args.n_past, n_next=args.n_next)
    np.savez(args.output, obsvs=obsvs, preds=preds, times=times,
             batches=batches)
    print(f"wrote {args.output}: {obsvs.shape[0]} samples "
          f"({args.n_past} obs / {args.n_next} pred), "
          f"{len(batches)} scene batches, interval {interval}")
    return 0


def cmd_train(args) -> int:
    import jax
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine import Trainer
    from socialways_tpu.io.checkpoint import (adopt_checkpoint_config,
                                              checkpoint_exists,
                                              restore_checkpoint,
                                              save_checkpoint)

    cfg = _cfg_from_args(args)
    # Resume adopts the checkpoint's model-defining config BEFORE the
    # trainer builds the model: the resumed run must continue THE run on
    # disk, not silently reinterpret its weights under different flags
    # (contradicting explicit flags are warned about; use a fresh
    # --model-dir / --dataset name to train a different model).
    resume_file = os.path.join(cfg.model_dir,
                               f"{args.model}-{args.dataset}.npz")
    if checkpoint_exists(resume_file):
        cfg = adopt_checkpoint_config(cfg, resume_file)
    ds = load_npz_dataset(args.data)
    mesh = None
    mesh_arg = str(getattr(args, "mesh", "0"))
    if mesh_arg not in ("0", ""):
        from socialways_tpu.parallel import make_mesh, make_mesh_2d
        if "x" in mesh_arg:
            n_dcn, n_ici = (int(v) for v in mesh_arg.split("x", 1))
            need = n_dcn * n_ici
        else:
            n_dcn, need = 0, int(mesh_arg)
        if len(jax.devices()) < need:
            print(f"ERROR: --mesh {mesh_arg} needs {need} devices, "
                  f"have {len(jax.devices())}", file=sys.stderr)
            return 1
        mesh = (make_mesh_2d(n_dcn, n_ici) if n_dcn
                else make_mesh(need))
    trainer = Trainer(cfg, ds, mesh=mesh)
    if cfg.d_input_noise_steps < 0:
        # Trainer resolves the -1 sentinel (anneal over the whole planned
        # run, counted in mesh-aware OPTIMIZER steps).
        print(f"instance-noise anneal over the full run: "
              f"{trainer.cfg.d_input_noise_steps} GAN steps")
    cfg = trainer.cfg  # n_past/n_next filled from data; -1 anneal resolved

    model_file = os.path.join(cfg.model_dir,
                              f"{args.model}-{cfg.dataset}.npz")
    best_file = os.path.join(cfg.model_dir,
                             f"{args.model}-{cfg.dataset}-best.npz")
    best_ade = float("inf")
    best_train_ade = float("inf")
    best_cov = -1.0
    cov_stall = 0
    from socialways_tpu.engine.rescue import StallTracker
    ade_tracker = StallTracker(args.ade_stall_recover,
                               grace=args.ade_stall_grace,
                               max_rescues=args.ade_stall_max_rescues,
                               classify_patience=getattr(
                                   args, "ade_stall_classify", 0))
    if ((args.ade_stall_recover
         or getattr(args, "ade_stall_classify", 0))
            and (trainer.test_packed is None
                 or cfg.test_interval >= cfg.n_epochs)):
        # the stall machine lives inside the periodic-eval block; with
        # no test split it never evaluates, and with test_interval >=
        # n_epochs the only eval lands at run end where the rescue's
        # epoch < n_epochs guard always blocks it
        print("WARNING: --ade-stall-recover is inert — the dataset has "
              "no test split or --test-interval reaches --epochs (the "
              "only eval would land at run end, where rescue is "
              "pointless), so no rescue can ever fire")
    if (args.ade_stall_recover < 0
            and getattr(args, "ade_stall_classify", 0) <= 0):
        print("WARNING: --ade-stall-recover -1 (gated mode) without "
              "--ade-stall-classify N is inert — the patience path is "
              "disabled and no signature trigger is armed")
    bestcov_file = os.path.join(cfg.model_dir,
                                f"{args.model}-{cfg.dataset}-bestcov.npz")
    state = trainer.init_state()
    rng = jax.random.PRNGKey(cfg.seed)
    start_epoch = 1
    if checkpoint_exists(model_file):
        state, last_epoch, rng, _ = restore_checkpoint(model_file, state)
        start_epoch = last_epoch + 1
        print(f"resumed from {model_file} at epoch {last_epoch}")

    if args.auto_recover and not checkpoint_exists(best_file):
        # pre-training baseline: a divergence before the first eval can
        # still be rescued (restores to init rather than crashing on)
        save_checkpoint(best_file, state, 0, rng, ds.scale, cfg)

    print(f"{args.data}  # training samples: {ds.n_train_samples}  "
          f"chunks: {trainer.train_packed.n_chunks}  "
          f"width: {trainer.train_packed.width}")
    print(f"hidden dim = {cfg.hidden_size} | lr(G) = {cfg.lr_g:.5f} | "
          f"lr(D) = {cfg.lr_d:.5f} | devices: {jax.devices()}")

    import math
    block = (args.block_size or math.gcd(cfg.save_interval,
                                         cfg.test_interval)) \
        if args.fused_epochs else 1
    epoch = start_epoch - 1
    while epoch < cfg.n_epochs:
        n_block = min(block, cfg.n_epochs - epoch) if block > 1 else 1
        rng, sub = jax.random.split(rng)
        if args.profile_dir and epoch == start_epoch + n_block - 1 \
                and epoch > start_epoch - 1:
            # profile the 2nd block (1st holds the compile)
            from socialways_tpu.utils.profiling import trace
            with trace(args.profile_dir):
                if n_block > 1:
                    state, m = trainer.train_epochs(state, sub, n_block)
                else:
                    state, m = trainer.train_epoch(state, sub)
            print(f"wrote profiler trace to {args.profile_dir}")
        elif n_block > 1:
            state, m = trainer.train_epochs(state, sub, n_block)
        else:
            state, m = trainer.train_epoch(state, sub)
        epoch += n_block
        print(f" Epc={epoch:4d}, Train ADE,FDE = ({m['train_ade']:.3f}, "
              f"{m['train_fde']:.3f}) | time = {m['epoch_time_s']:.2f}s"
              + (f" ({n_block} fused epochs)" if n_block > 1 else ""))
        _log_metrics(args.metrics_log, kind="train", epoch=epoch,
                     train_ade=m["train_ade"], train_fde=m["train_fde"],
                     epoch_time_s=m["epoch_time_s"], n_block=n_block)

        # divergence detection + recovery (GANs destabilize on long runs;
        # the reference has no failure-handling story — SURVEY §5.3)
        import math as _math
        diverged = (not _math.isfinite(m["train_ade"])
                    or m["train_ade"] > 5 * best_train_ade + 0.1)
        best_train_ade = min(best_train_ade, m["train_ade"])
        if args.auto_recover and diverged and checkpoint_exists(best_file):
            pre_rescue = state
            state, b_epoch, _, _ = restore_checkpoint(best_file, state)
            if getattr(args, "rescue_keep_clock", False):
                from socialways_tpu.engine import transplant_schedule_clock
                state = transplant_schedule_clock(state, pre_rescue)
            print(f"DIVERGED at epoch {epoch} (ADE {m['train_ade']:.3f}); "
                  f"restored best checkpoint from epoch {b_epoch}")

        if epoch % cfg.save_interval == 0:
            save_checkpoint(model_file, state, epoch, rng, ds.scale, cfg)
            print(f"saved checkpoint to {model_file}")

        if epoch % cfg.test_interval == 0 and trainer.test_packed is not None:
            rng, sub = jax.random.split(rng)
            ev = trainer.evaluate(state, sub)
            print(f"Avg ADE,FDE ({cfg.n_next})= ({ev['ade_avg']:.3f}, "
                  f"{ev['fde_avg']:.3f}) | Min({cfg.n_gen_samples}) ADE,FDE "
                  f"({cfg.n_next})= ({ev['ade_min']:.3f}, "
                  f"{ev['fde_min']:.3f})")
            _log_metrics(args.metrics_log, kind="eval", epoch=epoch,
                         ade_avg=ev["ade_avg"], fde_avg=ev["fde_avg"],
                         ade_min=ev["ade_min"], fde_min=ev["fde_min"])
            # best-model tracking: the reference initializes min_train_ADE
            # but never uses it (train.py:636); we keep the best-eval model
            if ev["ade_min"] < best_ade:
                best_ade = ev["ade_min"]
                save_checkpoint(best_file, state, epoch, rng, ds.scale, cfg)
                print(f"new best (ADE {best_ade:.3f}) saved to {best_file}")
            if (ade_tracker.observe(ev["ade_min"],
                                    ade_avg=ev.get("ade_avg"),
                                    train_ade=m.get("train_ade"))
                    and epoch < cfg.n_epochs
                    and checkpoint_exists(best_file)):
                pre_rescue = state
                state, b_epoch, _, _ = restore_checkpoint(best_file,
                                                          state)
                if getattr(args, "rescue_keep_clock", False):
                    from socialways_tpu.engine import \
                        transplant_schedule_clock
                    state = transplant_schedule_clock(state, pre_rescue)
                # fresh adversarial landscape (--stall-reset-d's move,
                # keyed on eval ADE; validated on the LOO protocol —
                # benchmarks/ethucy_timematched.py --stall-blocks)
                from socialways_tpu.engine.rescue import \
                    reinit_discriminator
                rng, kd = jax.random.split(rng)
                state = reinit_discriminator(state, cfg, kd)
                ade_tracker.fired(best_ade, at_epoch=epoch)
                trigger = (f"{ade_tracker.last_signature} signature "
                           f"matched for {args.ade_stall_classify} evals"
                           if ade_tracker.last_trigger == "classifier"
                           else f"unimproved for "
                                f"{args.ade_stall_recover} evals")
                print(f"ADE STALLED at epoch {epoch} (best "
                      f"{best_ade:.3f}, {trigger}); restored best "
                      f"checkpoint from epoch {b_epoch} with a "
                      f"RE-INITIALIZED discriminator")
                _log_metrics(args.metrics_log, kind="rescue",
                             epoch=epoch, ade_stall=True,
                             trigger=ade_tracker.last_trigger,
                             signature=ade_tracker.last_signature)
            if args.track_coverage:
                cov = _eval_coverage(trainer, state, ds, cfg, rng)
                print(f"mode coverage = {cov:.2f}")
                _log_metrics(args.metrics_log, kind="coverage",
                             epoch=epoch, coverage=cov)
                if cov > best_cov:
                    best_cov = cov
                    cov_stall = 0
                    save_checkpoint(bestcov_file, state, epoch, rng,
                                    ds.scale, cfg)
                    print(f"new best coverage saved to {bestcov_file}")
                else:
                    cov_stall += 1
                    if (args.stall_recover > 0
                            and cov_stall >= args.stall_recover
                            and best_cov < 1.0
                            and checkpoint_exists(bestcov_file)):
                        pre_rescue = state
                        state, c_epoch, _, _ = restore_checkpoint(
                            bestcov_file, state)
                        if getattr(args, "rescue_keep_clock", False):
                            from socialways_tpu.engine import \
                                transplant_schedule_clock
                            # keeps the sigma-anneal/lr-decay clocks
                            # monotonic; a subsequent --stall-reset-d
                            # still re-inits D's optimizer from 0
                            state = transplant_schedule_clock(state,
                                                              pre_rescue)
                        cov_stall = 0
                        extra = ""
                        if args.stall_reset_d:
                            from socialways_tpu.engine.rescue import \
                                reinit_discriminator
                            rng, kd = jax.random.split(rng)
                            state = reinit_discriminator(state, cfg, kd)
                            extra = " with a RE-INITIALIZED discriminator"
                        print(f"coverage STALLED at epoch {epoch} "
                              f"({cov:.2f} < best {best_cov:.2f}); "
                              f"restored best-coverage checkpoint from "
                              f"epoch {c_epoch}{extra}, continuing on a "
                              f"fresh stream")
            if cfg.dump_dir:
                _dump_first_chunk(trainer, state, ds, cfg, epoch, rng)

    # always leave a final checkpoint, even when n_epochs is not a multiple
    # of save_interval (the reference would end a short run with nothing
    # on disk, train.py:651-663) — evaluate/resume then always work
    if epoch % cfg.save_interval != 0:
        save_checkpoint(model_file, state, epoch, rng, ds.scale, cfg)
        print(f"saved final checkpoint to {model_file}")
    return 0


def _log_metrics(path: str, **record) -> None:
    """Append one JSON line to ``path`` (no-op when path is empty) — the
    machine-readable counterpart of the train-loop prints."""
    if not path:
        return
    import time
    record["t"] = round(time.time(), 3)
    with open(path, "a") as fh:
        fh.write(json.dumps(record) + "\n")


def _eval_coverage(trainer, state, ds, cfg, rng) -> float:
    """Toy mode coverage over (up to) the first 64 test samples."""
    import jax
    import jax.numpy as jnp

    from socialways_tpu.eval.metrics import k_sample_rollout
    from socialways_tpu.eval.stats import toy_mode_coverage

    nt = ds.n_train_samples
    obs = jnp.asarray(ds.obsvs[nt:nt + 64])
    ids = jnp.asarray(ds.scene_ids_for_rows(nt, obs.shape[0]))
    from socialways_tpu.engine.train_step import eval_params
    pk = k_sample_rollout(eval_params(state), obs, ids,
                          jax.random.fold_in(rng, 99), cfg.n_gen_samples,
                          cfg)
    return toy_mode_coverage(ds.scale.denormalize(np.asarray(obs)),
                             ds.scale.denormalize(np.asarray(pk[..., :2])))


def _dump_first_chunk(trainer, state, ds, cfg, epoch, rng) -> None:
    from socialways_tpu.eval.metrics import k_sample_rollout
    from socialways_tpu.io.dumps import dump_predictions
    if cfg.lnr_model == "kalman":
        from socialways_tpu.ops.kalman import predict_kalman as lnr_fn
    else:
        from socialways_tpu.ops.traj import predict_cv as lnr_fn
    import jax.numpy as jnp

    chunk = {k: v[0] for k, v in trainer._test_dev.items()}
    nv = int(trainer.test_packed.n_valid[0])
    from socialways_tpu.engine.train_step import eval_params
    pred_k = k_sample_rollout(eval_params(state), chunk["obsvs"],
                              chunk["scene_ids"], rng, cfg.n_gen_samples,
                              cfg)
    lnr = lnr_fn(chunk["obsvs"], cfg.n_next)
    t0 = ds.times[ds.n_train_samples] if len(ds.times) > ds.n_train_samples \
        else 0
    wr_dir = os.path.join(cfg.dump_dir, cfg.dataset, "socialWays", str(epoch))
    f = dump_predictions(wr_dir, epoch, t0,
                         np.asarray(chunk["obsvs"])[:nv],
                         np.asarray(pred_k)[:, :nv],
                         np.asarray(chunk["preds"])[:nv],
                         np.asarray(lnr)[:nv], ds.scale)
    print(f"saved predictions to {f}")


def cmd_evaluate(args) -> int:
    import jax
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine import Trainer
    from socialways_tpu.io.checkpoint import (adopt_checkpoint_config,
                                              restore_checkpoint)

    cfg = _cfg_from_args(args)
    if args.model_file:
        # the checkpoint knows which model its weights are (agent_frame /
        # use_social / widths) — adopt before building the eval model so a
        # bare `evaluate` can never silently run the wrong frame
        cfg = adopt_checkpoint_config(cfg, args.model_file)
    ds = load_npz_dataset(args.data)
    trainer = Trainer(cfg, ds)
    cfg = trainer.cfg

    state = trainer.init_state()
    if args.model_file:
        state, epoch, _, _ = restore_checkpoint(args.model_file, state)
        print(f"loaded {args.model_file} (epoch {epoch})")

    if args.linear:
        from socialways_tpu.eval.metrics import k_sample_errors
        from socialways_tpu.ops.kalman import predict_kalman
        from socialways_tpu.ops.traj import predict_cv
        import jax.numpy as jnp
        lnr_fn = predict_kalman if args.linear == "kalman" else predict_cv
        total_ade = total_fde = 0.0
        n = 0
        for i in range(trainer.test_packed.n_chunks):
            chunk = {k: v[i] for k, v in trainer._test_dev.items()}
            lnr = lnr_fn(chunk["obsvs"], cfg.n_next)
            err = k_sample_errors(lnr[None], chunk["preds"])[0]
            valid = np.asarray(chunk["valid"])
            total_ade += float(np.asarray(jnp.mean(err, -1))[valid].sum())
            total_fde += float(np.asarray(err[:, -1])[valid].sum())
            n += int(valid.sum())
        ss = ds.ss
        print(f"Linear baseline ({args.linear}): ADE,FDE ({cfg.n_next}) = "
              f"({total_ade / ss / max(n,1):.3f}, "
              f"{total_fde / ss / max(n,1):.3f})")
        return 0

    ev = trainer.evaluate(state, jax.random.PRNGKey(cfg.seed),
                          n_gen_samples=args.n_gen_samples)
    print(f"Avg ADE,FDE ({cfg.n_next})= ({ev['ade_avg']:.3f}, "
          f"{ev['fde_avg']:.3f}) | Min({args.n_gen_samples}) ADE,FDE "
          f"({cfg.n_next})= ({ev['ade_min']:.3f}, {ev['fde_min']:.3f})")
    return 0


def cmd_predict(args) -> int:
    """Inference-only forecasting from a checkpoint — the serving path.

    The reference cannot do this: its predict() lives inside train.py
    and only runs on windows that carry ground-truth futures
    (train.py:571-607).  Here a trained checkpoint forecasts (a) every
    window of a `create-dataset` npz, or (b) "everyone in the scene
    right now" of a RAW annotation file (`data/forecast.py` builds the
    observation-only tail windows create_dataset drops).  Normalization
    uses the CHECKPOINT's Scale (training-time), never refit on the
    inference data."""
    import jax
    import jax.numpy as jnp
    from socialways_tpu.data.dataset import pack_scene_batches
    from socialways_tpu.engine.train_step import (eval_params,
                                                  init_train_state)
    from socialways_tpu.eval.metrics import k_sample_rollout
    from socialways_tpu.io.checkpoint import (adopt_checkpoint_config,
                                              restore_checkpoint)
    from socialways_tpu.ops.traj import predict_cv

    cfg = _cfg_from_args(args)
    # adopt the checkpoint's model-defining config (agent_frame/use_social/
    # widths) before building anything; the serving path must never guess
    cfg = adopt_checkpoint_config(cfg, args.model_file)

    agent_idx = at_time = None
    # horizons: explicit flags win (None sentinel — an explicit value
    # equal to the old default must still win); otherwise the
    # checkpoint's training horizons (G's rollout works for any horizon,
    # but serving with the trained one is the calibrated default)
    n_past = args.n_past if args.n_past is not None else cfg.n_past
    n_next = args.n_next if args.n_next is not None else cfg.n_next
    if args.data.endswith(".npz"):
        d = np.load(args.data)
        obsvs_w = np.asarray(d["obsvs"], np.float32)        # world coords
        batches = np.asarray(d["batches"], np.int64)
        if "preds" in d.files:      # windowed training npz: adopt its
            n_next = d["preds"].shape[1]   # horizon (must match the ckpt)
    else:
        from socialways_tpu.data import (BIWIParser, SDDParser,
                                         SeyfriedParser, TrajnetParser)
        from socialways_tpu.data.forecast import forecast_windows
        parser_cls = {"biwi": BIWIParser, "trajnet": TrajnetParser,
                      "sdd": SDDParser, "seyfried": SeyfriedParser}
        p = parser_cls[args.parser]()
        p.load(args.data, down_sample=args.down_sample)
        obsvs_w, agent_idx, at_time = forecast_windows(
            p.p_data, p.t_data, n_past=n_past,
            at_time=args.at_time if args.at_time >= 0 else None)
        obsvs_w = obsvs_w.astype(np.float32)
        batches = np.asarray([[0, len(obsvs_w)]], np.int64)
        print(f"forecasting {len(obsvs_w)} agents at t={at_time}")
    cfg = cfg.replace(n_past=obsvs_w.shape[1], n_next=n_next)

    template = init_train_state(jax.random.PRNGKey(0), cfg)
    state, epoch, _, scale = restore_checkpoint(args.model_file, template)
    if scale is None:
        raise SystemExit("error: checkpoint carries no Scale — cannot "
                         "normalize inference data consistently with "
                         "training (re-save with this framework's "
                         "save_checkpoint)")
    print(f"loaded {args.model_file} (epoch {epoch})")

    obsvs_n = scale.normalize(obsvs_w)
    zeros_pred = np.zeros((len(obsvs_n), cfg.n_next, 2), np.float32)
    packed = pack_scene_batches(obsvs_n, zeros_pred, batches,
                                args.batch_size)

    g_params = eval_params(state)
    k = args.n_gen_samples
    roll = jax.jit(lambda p, o, s, r: k_sample_rollout(p, o, s, r, k, cfg))
    rng = jax.random.PRNGKey(cfg.seed)
    keys = jax.random.split(rng, packed.n_chunks)
    preds_n = np.empty((k, len(obsvs_n), cfg.n_next, 2), np.float32)
    lnr_n = np.empty((len(obsvs_n), cfg.n_next, 2), np.float32)
    for ci in range(packed.n_chunks):
        out = np.asarray(roll(g_params, packed.obsvs[ci],
                              packed.scene_ids[ci], keys[ci])[..., :2])
        cv = np.asarray(predict_cv(jnp.asarray(packed.obsvs[ci]),
                                   cfg.n_next)[..., :2])
        rows = np.flatnonzero(packed.valid[ci])
        orig = packed.row_map[ci][rows]        # original window indices
        preds_n[:, orig] = out[:, rows]
        lnr_n[orig] = cv[rows]

    out_path = args.out or "predictions.npz"
    payload = {
        "obsvs": obsvs_w,
        "preds_our": scale.denormalize(preds_n),
        "preds_lnr": scale.denormalize(lnr_n),
        "epoch": np.asarray(epoch, np.int64),
        "k": np.asarray(k, np.int64),
    }
    if agent_idx is not None:
        payload["agent_idx"] = agent_idx
        payload["timestamp"] = np.asarray(at_time, np.int64)
    np.savez(out_path, **payload)
    print(f"wrote {out_path}: preds_our {payload['preds_our'].shape} "
          f"(K={k}, world units) + CV baseline")
    return 0


def cmd_sweep(args) -> int:
    """Grid over (n_unrolling_steps, loss_info_w): train each variant,
    score eval ADE/FDE + toy mode coverage + EMD (the reference compares
    these variants offline in calc_statistics.py:179-187)."""

    import jax
    import jax.numpy as jnp

    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine import Trainer
    from socialways_tpu.eval.metrics import k_sample_rollout
    from socialways_tpu.eval.stats import toy_mode_coverage

    base = _cfg_from_args(args)
    ds = load_npz_dataset(args.data)
    results = {}
    for unroll in [int(u) for u in args.unrolls.split(",")]:
        for info_w in [float(w) for w in args.info_weights.split(",")]:
            cfg = base.replace(n_unrolling_steps=unroll,
                               loss_info_w=info_w,
                               use_info_loss=info_w > 0)
            tr = Trainer(cfg, ds)
            state = tr.init_state()
            rng = jax.random.PRNGKey(cfg.seed)
            done = 0
            block = 2000
            while done < args.sweep_epochs:
                n_blk = min(block, args.sweep_epochs - done)
                rng, sub = jax.random.split(rng)
                state, m = tr.train_epochs(state, sub, n_blk)
                done += n_blk
            rng, sub = jax.random.split(rng)
            ev = tr.evaluate(state, sub)

            # mode coverage over the test portion
            nt = ds.n_train_samples
            obs = jnp.asarray(ds.obsvs[nt:nt + 64])
            ids = jnp.asarray(ds.scene_ids_for_rows(nt, obs.shape[0]))
            rng, sub = jax.random.split(rng)
            from socialways_tpu.engine.train_step import eval_params
            pk = k_sample_rollout(eval_params(state), obs, ids, sub,
                                  args.coverage_k, tr.cfg)
            cov = toy_mode_coverage(
                ds.scale.denormalize(np.asarray(obs)),
                ds.scale.denormalize(np.asarray(pk[..., :2])))

            key = f"unroll{unroll}-info{info_w}"
            results[key] = {**ev, "mode_coverage": cov,
                            "final_train_ade": m["train_ade"]}
            print(f"{key}: ADE/FDE min-{base.n_gen_samples} = "
                  f"{ev['ade_min']:.3f}/{ev['fde_min']:.3f} | "
                  f"coverage = {cov:.2f}")

    best = max(results, key=lambda k: results[k]["mode_coverage"])
    print(f"best coverage: {best} "
          f"({results[best]['mode_coverage']:.2f})")
    with open(args.out_json, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {args.out_json}")
    return 0


def cmd_eth_ucy(args) -> int:

    from socialways_tpu.engine.ethucy import prepare_scenes, run_leave_one_out

    cfg = _cfg_from_args(args)
    scenes = tuple(args.scenes.split(","))
    out = {}

    # zero-ceremony readiness: if any scene npz is missing, look for raw
    # obsmat files (validated + fingerprinted) and window them on the fly
    npz_missing = [s for s in scenes if not os.path.exists(os.path.join(
        args.data_dir, f"{s}-{cfg.n_past}-{cfg.n_next}.npz"))]
    if npz_missing or args.prepare_only:
        manifest = prepare_scenes(args.data_dir, cfg, scenes=scenes)
        out["scenes"] = manifest
        if args.prepare_only:
            print(json.dumps(manifest, indent=2, default=str))
            if args.out_json:
                with open(args.out_json, "w") as fh:
                    json.dump(out, fh, indent=2, default=str)
            return 0

    out["folds"] = run_leave_one_out(
        args.data_dir, cfg, scenes=scenes, fused_block=args.fused_block,
        eval_every=args.eval_every,
        ade_stall_recover=args.ade_stall_recover,
        ade_stall_grace=args.ade_stall_grace,
        ade_stall_max_rescues=args.ade_stall_max_rescues,
        ade_stall_classify=getattr(args, "ade_stall_classify", 0))

    if args.compare_reference:
        # train the UNMODIFIED reference on the identical fold npz files
        # (benchmarks/ethucy_parity.py machinery; repo-checkout only)
        import sys as _sys
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        if repo not in _sys.path:
            _sys.path.insert(0, repo)
        try:
            from benchmarks.ethucy_parity import run_reference_fold
            from benchmarks.synth_ethucy import merge_fold
        except ImportError as e:
            print(f"--compare-reference needs the repo checkout's "
                  f"benchmarks/ ({e}); skipping", file=sys.stderr)
        else:
            ref = {}
            for held in scenes:
                files = [os.path.join(
                    args.data_dir, f"{s}-{cfg.n_past}-{cfg.n_next}.npz")
                    for s in scenes if s != held]
                fold = os.path.join(args.data_dir, f"fold_{held}.npz")
                merge_fold(files, os.path.join(
                    args.data_dir, f"{held}-{cfg.n_past}-{cfg.n_next}.npz"),
                    fold)
                ref[held] = run_reference_fold(fold, args.ref_epochs)
                print(f"[reference {held}] {ref[held]}")
            out["reference"] = ref

    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump(out, fh, indent=2, default=str)
        print(f"wrote {args.out_json}")
    return 0


def cmd_simulate(args) -> int:
    import time

    import jax
    import jax.numpy as jnp

    from socialways_tpu.engine.simulate import make_crowd_sim
    from socialways_tpu.models import init_generator

    sim_knobs = dict(
        n_past=8, n_next=12,
        use_pallas=not args.no_pallas and jax.default_backend() == "tpu",
        max_scene_size=args.scene_size)

    if args.model_file:
        from socialways_tpu.engine.train_step import (eval_params,
                                                      init_train_state)
        from socialways_tpu.io.checkpoint import (adopt_checkpoint_config,
                                                  load_checkpoint_config)
        from socialways_tpu.io.checkpoint import restore_checkpoint
        # the checkpoint decides the model (use_social/agent_frame/
        # widths) — adopt BEFORE applying the sim's legacy use_social
        # force, so a plain checkpoint doesn't draw a spurious
        # "contradicting flag" warning for a flag the user never passed.
        # Configless (pre-r5) checkpoints keep the legacy social default.
        cfg = adopt_checkpoint_config(_cfg_from_args(args),
                                      args.model_file)
        if load_checkpoint_config(args.model_file) is None \
                and not args.use_social:
            cfg = cfg.replace(use_social=True)
        cfg = cfg.replace(**sim_knobs)
        state, _, _, _ = restore_checkpoint(args.model_file,
                                            init_train_state(
                                                jax.random.PRNGKey(0), cfg))
        params = eval_params(state)
    else:
        cfg = _cfg_from_args(args).replace(use_social=True, **sim_knobs)
        params = init_generator(jax.random.PRNGKey(cfg.seed), cfg)

    n = args.agents
    rng = np.random.RandomState(cfg.seed)
    # agents start on a grid with small random walks as observed history
    base = rng.rand(n, 1, 2).astype(np.float32)
    steps = rng.randn(n, cfg.n_past, 2).astype(np.float32) * 0.005
    obsv0 = jnp.asarray(base + np.cumsum(steps, axis=1))
    scene_ids = jnp.asarray((np.arange(n) // args.scene_size)
                            .astype(np.int32))

    sim = make_crowd_sim(cfg, args.windows)
    out = sim(params, obsv0, scene_ids, jax.random.PRNGKey(1))
    float(jnp.sum(out))              # compile + true sync (host transfer)
    tic = time.perf_counter()
    out = sim(params, obsv0, scene_ids, jax.random.PRNGKey(2))
    float(jnp.sum(out))
    dt = time.perf_counter() - tic

    total_steps = n * args.windows * cfg.n_next
    print(f"simulated {n} agents x {args.windows * cfg.n_next} steps "
          f"(scenes of {args.scene_size}, social attention "
          f"{'on' if cfg.use_social else 'OFF — checkpoint trained without social'}, "
          f"pallas={cfg.use_pallas}) in {dt * 1e3:.1f} ms "
          f"= {total_steps / dt / 1e6:.2f}M agent-steps/s")
    if args.out:
        np.savez(args.out, trajectories=np.asarray(out))
        print(f"wrote {args.out}")
    return 0


def cmd_stats(args) -> int:
    from socialways_tpu.eval.stats import calc_and_store_stats, load_real_samples
    real = load_real_samples(args.real_npz, group=args.group)
    per_epoch = calc_and_store_stats(args.preds_dir, real,
                                     num_samples=args.num_samples)
    for epoch in sorted(per_epoch):
        one_nn, emd = per_epoch[epoch]
        print(f"epoch = {epoch}, EMD = {emd:.5f}, 1nn = {one_nn:.5f}")
    print(f"cached to {os.path.join(args.preds_dir, f'stats{args.num_samples}.npz')}")
    if args.plot:
        from socialways_tpu.viz.stats_plots import plot_stats_curves
        dirs = [args.preds_dir] + list(args.extra_dirs)
        for d in args.extra_dirs:     # make sure overlays have caches too
            calc_and_store_stats(d, real, num_samples=args.num_samples)
        out = plot_stats_curves(dirs, args.plot,
                                labels=args.labels or None,
                                num_samples=args.num_samples,
                                iters_per_epoch=args.iters_per_epoch)
        print(f"wrote {out}")
    return 0


def cmd_animate(args) -> int:
    from socialways_tpu.viz.animation import ToyAnimation
    d = np.load(args.npz)
    samples = np.concatenate([d["obsvs"], d["preds"]], axis=1)
    anim = ToyAnimation(samples, duration_s=args.duration, seed=args.seed)
    anim.save(args.out)
    print(f"wrote {args.out}")
    return 0


def cmd_plot_tracks(args) -> int:
    from socialways_tpu.data import (BIWIParser, SDDParser, SeyfriedParser,
                                     TrajnetParser)
    from socialways_tpu.viz.tracks import plot_tracks
    parser_cls = {"biwi": BIWIParser, "trajnet": TrajnetParser,
                  "sdd": SDDParser, "seyfried": SeyfriedParser}[args.parser]
    p = parser_cls()
    p.load(args.input, down_sample=args.down_sample)
    n = plot_tracks(p.p_data, args.out, min_len=args.min_len,
                    title=os.path.basename(args.input))
    print(f"wrote {args.out}: {n}/{len(p.p_data)} tracks "
          f"(min_len {args.min_len})")
    return 0


def cmd_visualize(args) -> int:
    from socialways_tpu.viz.heatmap import render_preds_dir
    out = render_preds_dir(args.preds_dir, args.out,
                           bg_image=args.bg_image,
                           homography=args.homography)
    print(f"wrote {out}")
    return 0


# ------------------------------------------------------------------ main
def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="socialways-tpu",
        description="TPU-native Social Ways trajectory prediction framework")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (note: the JAX_PLATFORMS "
                         "env var is ignored by some TPU plugins; this "
                         "flag sets the config before first backend use)")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="with --cpu: provision N virtual CPU devices "
                         "(xla_force_host_platform_device_count) so "
                         "--mesh N/AxB runs without real chips — the "
                         "standard fake-mesh pattern used by the test "
                         "suite and the multichip dryrun")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("create-toy", help="generate the toy dataset")
    p.add_argument("--npz", default="")
    p.add_argument("--txt", default="")
    p.add_argument("--n_conditions", type=int, default=6)
    p.add_argument("--n_modes", type=int, default=3)
    p.add_argument("--n_samples", type=int, default=3 * 6 * 12)
    p.add_argument("--n_per_batch", type=int, default=6)
    p.add_argument("--seed", type=int, default=30)
    p.set_defaults(fn=cmd_create_toy)

    p = sub.add_parser("create-dataset",
                       help="parse raw annotations into a training npz")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--parser", default="biwi",
                   choices=["biwi", "trajnet", "sdd", "seyfried"])
    p.add_argument("--n-past", type=int, default=8)
    p.add_argument("--n-next", type=int, default=12)
    p.add_argument("--down-sample", type=int, default=None,
                   help="frame subsampling; default = the parser's own (SDD: 12, others: 1)")
    p.set_defaults(fn=cmd_create_dataset)

    p = sub.add_parser("train", help="train the GAN")
    p.add_argument("--data", required=True)
    _add_model_flags(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("evaluate", help="evaluate a checkpoint")
    p.add_argument("--data", required=True)
    p.add_argument("--model-file", default="")
    p.add_argument("--linear", nargs="?", const="cv", default="",
                   choices=["cv", "kalman"],
                   help="evaluate a linear baseline instead: 'cv' "
                        "(constant velocity, reference "
                        "utils/linear_models.py:9-20; bare --linear keeps "
                        "meaning this) or 'kalman' (the reference's "
                        "commented-out MyKalman rebuilt live as "
                        "ops/kalman.py — filter the observation, roll the "
                        "dynamics forward)")
    _add_model_flags(p)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("predict",
                       help="inference-only forecasting from a checkpoint "
                            "(no ground-truth futures needed)")
    p.add_argument("--data", required=True,
                   help="a create-dataset npz (forecast every window) or "
                        "a RAW annotation file (forecast everyone in the "
                        "scene at --at-time; see --parser)")
    p.add_argument("--model-file", required=True)
    p.add_argument("--out", default="predictions.npz")
    p.add_argument("--parser", default="biwi",
                   choices=["biwi", "trajnet", "sdd", "seyfried"],
                   help="raw-mode annotation format")
    p.add_argument("--down-sample", type=int, default=None)
    p.add_argument("--n-past", type=int, default=None,
                   help="raw mode: observation window length (default: "
                        "the checkpoint's training n_past; 8 for "
                        "configless checkpoints)")
    p.add_argument("--n-next", type=int, default=None,
                   help="forecast horizon (default: the checkpoint's "
                        "training n_next, the calibrated choice; 12 for "
                        "configless checkpoints)")
    p.add_argument("--at-time", type=int, default=-1,
                   help="raw mode: forecast the scene at this timestamp "
                        "(-1 = the latest with a full-history agent)")
    _add_model_flags(p)
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("visualize", help="render prediction heatmaps")
    p.add_argument("--preds-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--bg-image", default="")
    p.add_argument("--homography", default="")
    p.set_defaults(fn=cmd_visualize)

    p = sub.add_parser("stats",
                       help="EMD + 1-NN distribution stats over dumps")
    p.add_argument("--preds-dir", required=True)
    p.add_argument("--real-npz", required=True,
                   help="dataset npz providing the real sample sets")
    p.add_argument("--num-samples", type=int, default=20)
    p.add_argument("--group", type=int, default=6,
                   help="pedestrians per real sample set")
    p.add_argument("--plot", default="",
                   help="also render the EMD & 1-NN vs-iteration curve "
                        "figure (calc_statistics.py:122-144) to this PNG")
    p.add_argument("--extra-dirs", nargs="*", default=[],
                   help="additional dump dirs to overlay in --plot "
                        "(multi-variant comparison)")
    p.add_argument("--labels", nargs="*", default=[],
                   help="curve labels for --plot (default: dir names)")
    p.add_argument("--iters-per-epoch", type=int, default=1,
                   help="x-axis scale: training steps per epoch")
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("sweep",
                       help="unrolled-GAN x latent-code sweep on the toy "
                            "set with mode-coverage scoring (config 4)")
    p.add_argument("--data", required=True)
    p.add_argument("--unrolls", default="0,1,5")
    p.add_argument("--info-weights", default="0.0,0.5,1.0")
    p.add_argument("--sweep-epochs", type=int, default=20000)
    p.add_argument("--coverage-k", type=int, default=64)
    p.add_argument("--out-json", default="sweep.json")
    _add_model_flags(p)
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("eth-ucy",
                       help="leave-one-scene-out ETH/UCY benchmark")
    p.add_argument("--data-dir", required=True,
                   help="directory with <scene>-8-12.npz files, OR raw "
                        "obsmat annotation files in any standard layout "
                        "(auto-detected, validated, fingerprinted and "
                        "windowed on the fly)")
    p.add_argument("--scenes", default="eth,hotel,univ,zara1,zara2")
    p.add_argument("--fused-block", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=0,
                   help="evaluate the held-out scene every N epochs "
                        "during training and report the best checkpoint "
                        "(best_ade_min/best_fde_min/best_at_epoch) "
                        "alongside the final eval; 0 = final eval only. "
                        "--ade-stall-recover uses these evals for its "
                        "stall rescue and defaults this to n_epochs/30")
    p.add_argument("--prepare-only", action="store_true",
                   help="stop after obsmat discovery + npz building")
    p.add_argument("--compare-reference", action="store_true",
                   help="also train the UNMODIFIED reference on each fold "
                        "npz (needs the repo checkout's benchmarks/)")
    p.add_argument("--ref-epochs", type=int, default=100,
                   help="reference epochs per fold for --compare-reference")
    p.add_argument("--out-json", default="")
    _add_model_flags(p)
    p.set_defaults(fn=cmd_eth_ucy)

    p = sub.add_parser("simulate",
                       help="large-scale crowd rollout with social attention")
    p.add_argument("--agents", type=int, default=10000)
    p.add_argument("--scene-size", type=int, default=16)
    p.add_argument("--windows", type=int, default=4)
    p.add_argument("--model-file", default="")
    p.add_argument("--out", default="", help="optional npz to write")
    p.add_argument("--no-pallas", action="store_true")
    _add_model_flags(p)
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("plot-tracks",
                       help="eyeball raw parsed tracks (reference "
                            "pick_subset.py as a real subcommand)")
    p.add_argument("input")
    p.add_argument("--out", required=True)
    p.add_argument("--parser", default="sdd",
                   choices=["biwi", "trajnet", "sdd", "seyfried"])
    p.add_argument("--down-sample", type=int, default=None,
                   help="frame subsampling; default = the parser's own (SDD: 12, others: 1)")
    p.add_argument("--min-len", type=int, default=0)
    p.set_defaults(fn=cmd_plot_tracks)

    p = sub.add_parser("animate", help="toy-dataset gif animation")
    p.add_argument("--npz", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--duration", type=int, default=5)
    p.set_defaults(fn=cmd_animate)

    return ap


def main(argv=None) -> int:
    argv = _apply_recipe(sys.argv[1:] if argv is None else argv)
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu_devices", 0) and not args.cpu:
        print("--cpu-devices requires --cpu", file=sys.stderr)
        return 1
    if args.cpu:
        if getattr(args, "cpu_devices", 0):
            # must precede first backend use; the env var is read when the
            # CPU client initializes (same recipe as tests/conftest.py)
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count="
                    f"{args.cpu_devices}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
