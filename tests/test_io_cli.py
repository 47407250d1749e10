"""Checkpoint round-trip, prediction dumps, CLI subcommands, viz rendering."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from socialways_tpu.cli.main import main as cli_main
from socialways_tpu.config import TrainConfig
from socialways_tpu.engine.train_step import init_train_state
from socialways_tpu.io.checkpoint import (
    checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from socialways_tpu.data.scale import Scale

CFG = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                  n_past=2, n_next=2)


def test_checkpoint_round_trip(tmp_path):
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    rng = jax.random.PRNGKey(42)
    scale = Scale()
    scale.min_x, scale.max_x, scale.min_y, scale.max_y = 0., 4., 0., 2.
    scale.calc_scale()

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, epoch=7, rng=rng, scale=scale)
    assert checkpoint_exists(path)

    template = init_train_state(jax.random.PRNGKey(99), CFG)  # different init
    restored, epoch, rng2, scale2 = restore_checkpoint(path, template)
    assert epoch == 7
    np.testing.assert_array_equal(jax.random.key_data(rng),
                                  jax.random.key_data(rng2))
    assert scale2.sx == scale.sx
    np.testing.assert_array_equal(
        np.asarray(restored.g_params["embed"]["w"]),
        np.asarray(state.g_params["embed"]["w"]))
    # optimizer state restored too
    flat_a = jax.tree_util.tree_leaves(restored.g_opt)
    flat_b = jax.tree_util.tree_leaves(state.g_opt)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "c.npz")
    save_checkpoint(path, state, 1, jax.random.PRNGKey(0))
    bigger = init_train_state(jax.random.PRNGKey(0),
                              CFG.replace(hidden_size=32,
                                          social_feature_size=32))
    with pytest.raises(ValueError):
        restore_checkpoint(path, bigger)


def test_cli_create_toy(tmp_path):
    npz = str(tmp_path / "toy.npz")
    assert cli_main(["create-toy", "--npz", npz]) == 0
    d = np.load(npz)
    assert d["obsvs"].shape == (216, 2, 2)


def test_cli_create_dataset(tmp_path):
    rows = []
    for aid in (1, 2):
        for k in range(30):
            rows.append(f"{10*k}.0 {aid}.0 {0.4*k+aid} 0.0 {2.0*aid-0.3*k} "
                        "0.4 0.0 -0.3")
    src = tmp_path / "obsmat.txt"
    src.write_text("\n".join(rows) + "\n")
    out = str(tmp_path / "ds.npz")
    assert cli_main(["create-dataset", str(src), out]) == 0
    d = np.load(out)
    assert d["obsvs"].shape[1:] == (8, 2)
    assert d["preds"].shape[1:] == (12, 2)


def test_cli_train_evaluate_round_trip(tmp_path, toy_npz):
    model_dir = str(tmp_path / "models")
    args = ["train", "--data", toy_npz, "--epochs", "2", "--h-size", "16",
            "--model-dir", model_dir, "--save-interval", "1",
            "--test-interval", "1", "--dataset", "toy",
            "--dump-dir", str(tmp_path / "dumps")]
    assert cli_main(args) == 0
    ckpt = os.path.join(model_dir, "socialWays-toy.npz")
    assert os.path.isfile(ckpt)
    # dumps written with the reference schema
    dump_root = str(tmp_path / "dumps" / "toy" / "socialWays")
    files = [f for _, _, fs in os.walk(dump_root) for f in fs]
    assert files, "no prediction dumps written"
    d = np.load(os.path.join(dump_root, "1",
                             sorted(files)[0]))
    for key in ("timestamp", "obsvs", "preds_our", "preds_gtt", "preds_lnr"):
        assert key in d
    assert d["preds_our"].ndim == 4

    # resume continues from epoch 3
    assert cli_main(["train", "--data", toy_npz, "--epochs", "3",
                     "--h-size", "16", "--model-dir", model_dir,
                     "--save-interval", "1", "--test-interval", "10",
                     "--dataset", "toy"]) == 0

    assert cli_main(["evaluate", "--data", toy_npz, "--model-file", ckpt,
                     "--h-size", "16", "--k", "4"]) == 0
    assert cli_main(["evaluate", "--data", toy_npz, "--linear",
                     "--h-size", "16"]) == 0


def test_sdd_create_dataset_train_smoke(tmp_path):
    """End-to-end: SDD annotation fixture → create-dataset --parser sdd →
    2-epoch train.  Covers the one parser that had no CLI-reachable test
    (reference format: parse_utils.py:150-228)."""
    rows = []
    rng = np.random.RandomState(3)
    for aid in range(6):
        x0, y0 = rng.rand(2) * 50
        dx, dy = rng.rand(2) * 4 - 2
        for k in range(30):                      # ts 0, 12, ..., 348
            t = 12 * k
            x = x0 + dx * k
            y = y0 + dy * k
            rows.append(f'{aid} {x:.1f} {y:.1f} {x + 10:.1f} {y + 14:.1f} '
                        f'{t} 0 0 0 "Pedestrian"')
    ann = tmp_path / "annotations.txt"
    ann.write_text("\n".join(rows) + "\n")
    out = str(tmp_path / "sdd.npz")
    assert cli_main(["create-dataset", str(ann), out,
                     "--parser", "sdd", "--n-past", "2", "--n-next", "2"
                     ]) == 0
    d = np.load(out)
    assert d["obsvs"].shape[1:] == (2, 2) and d["obsvs"].shape[0] > 20
    assert cli_main(["train", "--data", out, "--epochs", "2",
                     "--h-size", "16", "--batch-size", "32",
                     "--model-dir", str(tmp_path / "m"),
                     "--test-interval", "10", "--dataset", "sddtoy"]) == 0


def test_evaluate_linear_kalman_beats_cv_on_curves(tmp_path, capsys):
    """`evaluate --linear kalman` is wired end-to-end and beats the CV
    baseline on curved noisy tracks (the ops-level ordering, now reachable
    from the CLI — reference counterpart: the commented-out MyKalman,
    utils/linear_models.py:23-124)."""
    import re

    rng = np.random.RandomState(0)
    n, n_past, n_next = 40, 8, 12
    tt = np.arange(n_past + n_next, dtype=np.float32)
    obsvs, preds = [], []
    for i in range(n):
        # constant-turn arcs with measurement noise — curvature is what
        # the const-accel KF can track and pure CV extrapolation cannot
        r = 2.0 + rng.rand() * 2.0
        w = 0.12 + 0.05 * rng.rand()
        phi = rng.rand() * 2 * np.pi
        xy = np.stack([r * np.cos(phi + w * tt),
                       r * np.sin(phi + w * tt)], axis=-1)
        xy += 0.01 * rng.randn(*xy.shape).astype(np.float32)
        obsvs.append(xy[:n_past])
        preds.append(xy[n_past:])
    obsvs = np.asarray(obsvs, np.float32)
    preds = np.asarray(preds, np.float32)
    times = np.arange(n, dtype=np.int32)
    batches = np.stack([np.arange(0, n, 4), np.arange(4, n + 1, 4)],
                       axis=-1).astype(np.int16)
    npz = str(tmp_path / "curves.npz")
    np.savez(npz, obsvs=obsvs, preds=preds, times=times, batches=batches)

    def linear_ade(kind):
        assert cli_main(["evaluate", "--data", npz, "--linear", kind,
                         "--h-size", "16"]) == 0
        out = capsys.readouterr().out
        m = re.search(rf"Linear baseline \({kind}\).*= \(([\d.]+),", out)
        assert m, out
        return float(m.group(1))

    ade_cv = linear_ade("cv")
    ade_kf = linear_ade("kalman")
    assert ade_kf < ade_cv


def test_viz_render(tmp_path, toy_npz):
    from socialways_tpu.io.dumps import dump_predictions
    from socialways_tpu.viz.heatmap import render_preds_dir

    rng = np.random.RandomState(0)
    n, k = 6, 8
    obsvs = rng.rand(n, 2, 2).astype(np.float32) - 0.5
    preds_our = rng.rand(k, n, 2, 2).astype(np.float32) - 0.5
    preds = rng.rand(n, 2, 2).astype(np.float32) - 0.5
    dump_dir = str(tmp_path / "preds" / "5")
    dump_predictions(dump_dir, 5, 0, obsvs, preds_our, preds, preds)

    out_dir = str(tmp_path / "figs")
    render_preds_dir(str(tmp_path / "preds"), out_dir)
    pngs = os.listdir(out_dir)
    assert pngs == ["00005.png"]
    import cv2
    im = cv2.imread(os.path.join(out_dir, pngs[0]))
    assert im.shape == (480, 480, 3)
    # something was drawn (not a uniform canvas)
    assert im.std() > 1.0


def test_cli_recipe_expands_and_explicit_flags_override(capsys):
    """--recipe NAME expands the documented BASELINE.md bundle; explicit
    flags after it win (argparse last-wins on the injected tokens)."""
    from socialways_tpu.cli.main import (_apply_recipe, _cfg_from_args,
                                         build_parser)
    argv = _apply_recipe(["train", "--data", "x.npz", "--recipe",
                          "toy-flagship", "--info-weight", "2.0"])
    args = build_parser().parse_args(argv)
    cfg = _cfg_from_args(args)
    assert cfg.latent_code_type == "categorical"
    assert cfg.n_latent_codes == 3
    assert cfg.lr_d == 5e-4
    assert cfg.d_lr_decay_rate == 0.7
    assert cfg.d_input_noise == 0.05 and cfg.d_input_noise_steps == -1
    assert cfg.agent_frame and cfg.use_social
    assert cfg.g_ema_decay == 0.999
    assert args.auto_recover
    assert cfg.loss_info_w == 2.0      # explicit flag beats the recipe
    # the deprecated 'flagship' name still expands (to the same bundle)
    # with a stderr deprecation note pointing at --recipe loo
    aliased = _apply_recipe(["train", "--data", "x.npz",
                             "--recipe", "flagship", "--info-weight", "2.0"])
    assert aliased == argv
    assert "deprecated" in capsys.readouterr().err
    # --recipe=NAME form, and no-recipe argv passes through untouched
    assert _apply_recipe(["train", "--recipe=robust1"])[1] == "--latent-code"
    assert _apply_recipe(["train", "--b", "64"]) == ["train", "--b", "64"]


def test_cli_recipe_loo_is_the_documented_record_arm(capsys):
    """--recipe loo expands to EXACTLY the BASELINE.md r4l record-arm
    flags (af + social + EMA + annealed instance noise with 0.02 floor +
    graced rescue, reference-default hyperparameters otherwise), and
    eth-ucy defaults to it."""
    from socialways_tpu.cli.main import (_apply_recipe, _cfg_from_args,
                                         build_parser)
    argv = _apply_recipe(["train", "--data", "x.npz", "--recipe", "loo"])
    args = build_parser().parse_args(argv)
    cfg = _cfg_from_args(args)
    assert cfg.agent_frame and cfg.use_social
    assert cfg.g_ema_decay == 0.999
    assert cfg.d_input_noise == 0.05
    assert cfg.d_input_noise_steps == -1
    assert cfg.d_input_noise_floor == 0.02
    # gated rescue: patience path disarmed, signature trigger armed
    # (the policy that won the r5 8-seed A/B)
    assert args.ade_stall_recover == -1
    assert args.ade_stall_classify == 5
    assert args.ade_stall_grace == 2 and args.ade_stall_max_rescues == 3
    # and NOT the toy bundle's hyperparameters (the 6.4x-worse r4m arm)
    assert cfg.latent_code_type == "continuous"
    assert cfg.lr_d == 1e-3 and cfg.d_lr_decay_rate == 1.0
    assert cfg.loss_info_w == 0.5

    # eth-ucy with no --recipe gets the loo bundle injected...
    capsys.readouterr()
    auto = _apply_recipe(["eth-ucy", "--data-dir", "/x"])
    assert auto[1:3] == ["--agent-frame", "--use-social"]
    assert "--ade-stall-recover" in auto
    assert "defaults to --recipe loo" in capsys.readouterr().err
    # ...and --recipe= opts out (argparse accepts the empty choice)
    bare = _apply_recipe(["eth-ucy", "--data-dir", "/x", "--recipe="])
    assert "--agent-frame" not in bare

    # global flags before the subcommand: the bundle still lands AFTER
    # the subcommand (round-5 regression: it used to land after argv[0],
    # breaking `--cpu train --recipe loo`)
    capsys.readouterr()
    gl = _apply_recipe(["--cpu", "--cpu-devices", "8", "train",
                        "--data", "x.npz", "--recipe", "loo"])
    assert gl[:4] == ["--cpu", "--cpu-devices", "8", "train"]
    assert gl[4] == "--agent-frame"
    gl2 = _apply_recipe(["--cpu", "eth-ucy", "--data-dir", "/x"])
    assert gl2[:2] == ["--cpu", "eth-ucy"] and gl2[2] == "--agent-frame"


def test_cli_anneal_horizon_counts_optimizer_steps(tmp_path, toy_npz,
                                                   capsys):
    """--d-input-noise-steps -1 anneals over OPTIMIZER steps: a --mesh N
    epoch performs ~n_chunks/N synchronized DP steps, so the horizon must
    shrink with the mesh (counting raw chunks would leave sigma at
    ~(1-1/N)·sigma0 at run end — round-2 advisor finding)."""
    import math
    import re

    def run(extra):
        model_dir = str(tmp_path / ("m_" + "_".join(extra) or "flat"))
        rc = cli_main(["train", "--data", toy_npz, "--epochs", "2",
                       "--h-size", "16", "--batch-size", "32",
                       "--model-dir", model_dir, "--save-interval", "50",
                       "--test-interval", "50", "--dataset", "toy",
                       "--d-input-noise", "0.05",
                       "--d-input-noise-steps", "-1"] + extra)
        out = capsys.readouterr().out
        assert rc == 0
        total = int(re.search(r"anneal over the full run: (\d+)", out)
                    .group(1))
        chunks = int(re.search(r"chunks: (\d+)", out).group(1))
        return total, chunks

    total_1, chunks = run([])
    assert chunks > 1, "toy pack too small to exercise the horizon"
    assert total_1 == 2 * chunks
    total_m, _ = run(["--mesh", "2"])
    assert total_m == 2 * math.ceil(chunks / 2)


def test_cli_train_short_run_saves_final_checkpoint(tmp_path, toy_npz):
    """A run shorter than save-interval must still leave a checkpoint
    (the reference would end with nothing on disk, train.py:651-663) so
    the documented evaluate step always works."""
    model_dir = str(tmp_path / "m2")
    assert cli_main(["train", "--data", toy_npz, "--epochs", "2",
                     "--h-size", "16", "--model-dir", model_dir,
                     "--save-interval", "50", "--test-interval", "50",
                     "--dataset", "toy"]) == 0
    ckpt = os.path.join(model_dir, "socialWays-toy.npz")
    assert os.path.isfile(ckpt)
    assert cli_main(["evaluate", "--data", toy_npz, "--model-file", ckpt,
                     "--h-size", "16", "--k", "2"]) == 0


def test_cli_plot_tracks(tmp_path):
    """plot-tracks parses an annotation file and writes a PNG (reference
    pick_subset.py's eyeballing loop as a subcommand)."""
    ann = tmp_path / "biwi.txt"
    rows = []
    for aid in (1, 2, 3):
        for k in range(6):
            t = 10 * (k + 1)
            rows.append(f"{t} {aid} {0.1 * k + aid} 0 {0.2 * k} 0 0 0")
    ann.write_text("\n".join(rows) + "\n")
    out = tmp_path / "tracks.png"
    rc = cli_main(["plot-tracks", str(ann), "--parser", "biwi",
                   "--out", str(out), "--min-len", "3"])
    assert rc == 0 and out.exists() and out.stat().st_size > 0


def test_cli_ade_stall_recover(tmp_path, toy_npz, capsys, monkeypatch):
    """--ade-stall-recover N: after N evals without a >2% best-ADE
    improvement, train restores the best checkpoint and re-initializes
    D (the --stall-reset-d mechanism keyed on eval ADE — usable on
    non-toy data where coverage is undefined).  A constant-ADE evaluate
    makes every eval a stall, so the rescue must fire exactly once in a
    3-epoch run (the final eval is guarded: no pointless rescue at run
    end)."""
    from socialways_tpu.engine.trainer import Trainer

    def const_eval(self, state, rng, n_gen_samples=None):
        return {"ade_min": 1.0, "fde_min": 2.0,
                "ade_avg": 1.0, "fde_avg": 2.0}

    monkeypatch.setattr(Trainer, "evaluate", const_eval)
    rc = cli_main(["train", "--data", toy_npz, "--epochs", "3",
                   "--h-size", "16", "--batch-size", "32",
                   "--model-dir", str(tmp_path / "m"),
                   "--save-interval", "50", "--test-interval", "1",
                   "--dataset", "toy", "--ade-stall-recover", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("ADE STALLED") == 1
    assert "RE-INITIALIZED discriminator" in out


@pytest.mark.slow
def test_cli_ade_stall_grace_and_rescue_cap(tmp_path, toy_npz, capsys,
                                            monkeypatch):
    """Post-rescue grace and the ineffective-rescue cap: with a
    constant-ADE evaluate, grace 0 and max-rescues 1, a 5-epoch run
    fires rescue #1 (always allowed), rescue #2 (ineffective streak 1),
    then is capped — exactly two rescues.  With the default grace (2),
    the same run fires only once (the two evals after the rescue are
    the transient window)."""
    from socialways_tpu.engine.trainer import Trainer

    def const_eval(self, state, rng, n_gen_samples=None):
        return {"ade_min": 1.0, "fde_min": 2.0,
                "ade_avg": 1.0, "fde_avg": 2.0}

    monkeypatch.setattr(Trainer, "evaluate", const_eval)
    base = ["train", "--data", toy_npz, "--epochs", "5",
            "--h-size", "16", "--batch-size", "32",
            "--save-interval", "50", "--test-interval", "1",
            "--dataset", "toy", "--ade-stall-recover", "1"]
    rc = cli_main(base + ["--model-dir", str(tmp_path / "a"),
                          "--ade-stall-grace", "0",
                          "--ade-stall-max-rescues", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("ADE STALLED") == 2          # capped after rescue 2

    rc = cli_main(base + ["--model-dir", str(tmp_path / "b")])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("ADE STALLED") == 1          # grace 2 absorbs evals


@pytest.mark.slow
def test_cli_predict_npz_and_raw(tmp_path, toy_npz, capsys):
    """cli predict (the serving path — no reference counterpart; its
    predict() only runs inside train.py on windows with futures,
    train.py:571-607): forecast (a) every window of a create-dataset
    npz and (b) the live scene of a raw obsmat, from one checkpoint,
    normalized with the CHECKPOINT's Scale."""
    mdir = tmp_path / "m"
    rc = cli_main(["train", "--data", toy_npz, "--epochs", "2",
                   "--h-size", "16", "--batch-size", "64",
                   "--save-interval", "2", "--test-interval", "5",
                   "--dataset", "toy", "--model-dir", str(mdir)])
    assert rc == 0
    ckpt = str(mdir / "socialWays-toy.npz")

    out = tmp_path / "preds.npz"
    rc = cli_main(["predict", "--data", toy_npz, "--model-file", ckpt,
                   "--h-size", "16", "--batch-size", "64",
                   "--out", str(out)])
    assert rc == 0
    d = np.load(out)
    n = np.load(toy_npz)["obsvs"].shape[0]
    assert d["preds_our"].shape == (20, n, 2, 2)      # [K, N, n_next, 2]
    assert d["preds_lnr"].shape == (n, 2, 2)
    assert np.isfinite(d["preds_our"]).all()
    # CV commutes with the affine normalization: denorm(cv(norm(x)))
    # == cv(x) — check a row against predict_cv run on WORLD coords
    from socialways_tpu.ops.traj import predict_cv
    obs = np.load(toy_npz)["obsvs"][:4]
    world_cv = np.asarray(predict_cv(jnp.asarray(obs), 2))[..., :2]
    np.testing.assert_allclose(d["preds_lnr"][:4], world_cv,
                               rtol=1e-4, atol=1e-4)

    # raw mode: 3 agents walking 10 frames; forecast "now"
    raw = tmp_path / "obsmat.txt"
    rows = []
    for aid in range(3):
        for f in range(10):
            x, y = 0.5 * f + aid, 1.0 * aid - 0.1 * f
            rows.append(f"{f * 6} {aid + 1} {x} 0 {y} 0 0 0")
    raw.write_text("\n".join(rows) + "\n")
    # the toy checkpoint was trained with n_past=n_next=2: match it
    out2 = tmp_path / "preds_raw.npz"
    rc = cli_main(["predict", "--data", str(raw), "--model-file", ckpt,
                   "--h-size", "16", "--batch-size", "64",
                   "--n-past", "2", "--n-next", "2",
                   "--out", str(out2)])
    assert rc == 0
    d = np.load(out2)
    assert d["preds_our"].shape == (20, 3, 2, 2)      # everyone present
    assert int(d["timestamp"]) == 54                  # the last frame
    assert np.isfinite(d["preds_our"]).all()


def test_checkpoint_carries_and_adopts_config(tmp_path):
    """Checkpoints embed the model-defining TrainConfig fields; a consumer
    adopting them rebuilds the exact model with no CLI flags (round-4
    verdict weak #2: an --agent-frame --use-social checkpoint has the same
    pytree structure as a plain one, so without this it loads cleanly and
    silently serves world-frame, social-less rollouts)."""
    from socialways_tpu.io.checkpoint import (adopt_checkpoint_config,
                                              load_checkpoint_config)

    cfg = CFG.replace(agent_frame=True, use_social=True, g_ema_decay=0.99)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "af.npz")
    save_checkpoint(path, state, 3, jax.random.PRNGKey(1), cfg=cfg)

    saved = load_checkpoint_config(path)
    assert saved["agent_frame"] and saved["use_social"]
    assert saved["hidden_size"] == 16 and saved["g_ema_decay"] == 0.99

    # bare default cfg adopts the checkpoint's model fields silently
    adopted = adopt_checkpoint_config(TrainConfig(), path)
    assert adopted.agent_frame and adopted.use_social
    assert adopted.hidden_size == 16
    assert adopted.noise_len == 8 and adopted.g_ema_decay == 0.99
    # structure check: the adopted config rebuilds a template the
    # checkpoint restores into (incl. the g_ema leaf)
    template = init_train_state(jax.random.PRNGKey(9), adopted)
    restored, _, _, _ = restore_checkpoint(path, template)
    assert restored.g_ema is not None

    # contradicting EXPLICIT flag: loud warning, checkpoint wins
    import io as _io
    buf = _io.StringIO()
    clash = adopt_checkpoint_config(TrainConfig(hidden_size=128), path,
                                    warn_stream=buf)
    assert clash.hidden_size == 16
    assert "contradicts" in buf.getvalue()

    # training-only fields stay CLI-controlled (not in the checkpoint)
    assert adopted.lr_g == TrainConfig().lr_g
    assert saved.get("lr_g") is None


def test_checkpoint_without_config_still_loads(tmp_path):
    """Pre-round-5 checkpoints (no __config__ key) restore exactly as
    before and adoption is a no-op."""
    from socialways_tpu.io.checkpoint import (adopt_checkpoint_config,
                                              load_checkpoint_config)

    state = init_train_state(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "old.npz")
    save_checkpoint(path, state, 2, jax.random.PRNGKey(0))   # no cfg
    assert load_checkpoint_config(path) is None
    cfg = TrainConfig(hidden_size=123)
    assert adopt_checkpoint_config(cfg, path) is cfg
    restored, epoch, _, _ = restore_checkpoint(
        path, init_train_state(jax.random.PRNGKey(4), CFG))
    assert epoch == 2


@pytest.mark.slow
def test_cli_serve_adopts_checkpoint_config(tmp_path, toy_npz, capsys):
    """The verdict's done-condition: train --agent-frame --use-social, then
    run evaluate and predict with NO model flags — outputs must be
    IDENTICAL to the fully-flagged invocation (previously the bare run
    silently produced world-frame, social-less garbage)."""
    mdir = tmp_path / "m"
    rc = cli_main(["train", "--data", toy_npz, "--epochs", "2",
                   "--h-size", "16", "--batch-size", "64",
                   "--agent-frame", "--use-social",
                   "--save-interval", "2", "--test-interval", "5",
                   "--dataset", "toy", "--model-dir", str(mdir)])
    assert rc == 0
    ckpt = str(mdir / "socialWays-toy.npz")

    def run_eval(flags):
        rc = cli_main(["evaluate", "--data", toy_npz, "--model-file", ckpt,
                       "--k", "4"] + flags)
        assert rc == 0
        return capsys.readouterr().out.splitlines()[-1]

    flagged = run_eval(["--h-size", "16", "--agent-frame", "--use-social"])
    bare = run_eval([])
    assert bare == flagged

    def run_predict(flags, name):
        out = str(tmp_path / name)
        rc = cli_main(["predict", "--data", toy_npz, "--model-file", ckpt,
                       "--batch-size", "64", "--out", out] + flags)
        capsys.readouterr()
        assert rc == 0
        return np.load(out)["preds_our"]

    p_flagged = run_predict(["--h-size", "16", "--agent-frame",
                             "--use-social"], "flagged.npz")
    p_bare = run_predict([], "bare.npz")
    np.testing.assert_array_equal(p_bare, p_flagged)
