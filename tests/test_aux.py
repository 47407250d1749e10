"""Aux subsystem tests: distribution stats, animation, utils, video display."""

import os

import numpy as np
import pytest

from socialways_tpu.eval.stats import (
    calc_and_store_stats,
    compute_1nn,
    compute_wasserstein,
    load_real_samples,
    stats_for_dump,
)
from socialways_tpu.utils import (
    StepTimer,
    cart2pol,
    norm,
    pol2cart,
    step_decay_lr,
    unit,
)


# ------------------------------------------------------------ 1-NN / EMD
def _sets(sep):
    """Two K=6 sample sets of 3 peds, 4 steps, separated by ``sep``."""
    rng = np.random.RandomState(0)
    reals = rng.randn(6, 3, 4, 2) * 0.1
    fakes = rng.randn(6, 3, 4, 2) * 0.1 + sep
    return reals, fakes


def test_1nn_separated_vs_identical():
    reals, fakes = _sets(10.0)
    acc = compute_1nn(reals, fakes, obsv_len=2)
    assert acc[0] == 1.0          # fully separable → 100% 1-NN accuracy
    # twinned samples (fake ≈ its real counterpart) → every nearest
    # neighbor is the opposite class → accuracy collapses toward 0
    reals2, _ = _sets(0.0)
    fakes2 = reals2 + np.random.RandomState(1).randn(*reals2.shape) * 1e-3
    acc2 = compute_1nn(reals2, fakes2, obsv_len=2)
    assert acc2[0] <= 0.5


def test_emd_orders_by_separation():
    r, f_near = _sets(0.5)
    _, f_far = _sets(5.0)
    e_near = compute_wasserstein(r, f_near, obsv_len=2)
    e_far = compute_wasserstein(r, f_far, obsv_len=2)
    assert 0 < e_near < e_far
    # identical sets have ~zero EMD
    assert compute_wasserstein(r, r, obsv_len=2) < 1e-9
    # mismatched sample counts: the assignment matches min(Ka, Kb) pairs,
    # so halving the fake set must NOT deflate the EMD (per-pair cost is
    # what is averaged)
    e_half = compute_wasserstein(r, f_far[: f_far.shape[0] // 2],
                                 obsv_len=2)
    assert e_half > 0.5 * e_far


def test_stats_pipeline_over_dumps(tmp_path, toy_npz):
    from socialways_tpu.io.dumps import dump_predictions

    real = load_real_samples(toy_npz, group=6)
    k, n_ped, t = real.shape[0], 6, real.shape[2]
    rng = np.random.RandomState(0)
    # fake predictions = real + noise for the first 6 peds
    obsvs = real[0, :, :2]
    preds_k = real[:20, :, 2:] + rng.randn(20, n_ped, t - 2, 2) * 0.01
    d = str(tmp_path / "dumps" / "100")
    dump_predictions(d, 100, 0, obsvs, preds_k, real[0, :, 2:],
                     real[0, :, 2:])

    per_epoch = calc_and_store_stats(str(tmp_path / "dumps"), real,
                                     num_samples=20, min_peds=3)
    assert 100 in per_epoch
    one_nn, emd = per_epoch[100]
    assert emd < 0.5
    cache = np.load(str(tmp_path / "dumps" / "stats20.npz"))
    assert cache["epochs"].tolist() == [100]


# ---------------------------------------------------------------- utils
def test_math_utils_round_trip():
    rho, phi = cart2pol(3.0, 4.0)
    assert rho == pytest.approx(5.0)
    x, y = pol2cart(rho, phi)
    assert x == pytest.approx(3.0) and y == pytest.approx(4.0)
    assert norm([3.0, 4.0]) == pytest.approx(5.0)
    np.testing.assert_allclose(unit([3.0, 4.0]), [0.6, 0.8])
    np.testing.assert_allclose(unit([0.0, 0.0]), [0.0, 0.0])


def test_step_decay_lr():
    sched = step_decay_lr(0.005, 0.6, 50)
    assert sched(0) == pytest.approx(0.005)
    assert sched(49) == pytest.approx(0.005)
    assert sched(50) == pytest.approx(0.003)
    assert sched(100) == pytest.approx(0.0018)


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["total_s"] >= 0


# ------------------------------------------------------------ animation
def test_toy_animation_saves_gif(tmp_path, toy_arrays):
    from socialways_tpu.viz.animation import ToyAnimation

    samples = np.concatenate([toy_arrays["obsvs"][:12],
                              toy_arrays["preds"][:12]], axis=1)
    anim = ToyAnimation(samples, fps=5, duration_s=1, seed=0)
    out = str(tmp_path / "toy.gif")
    anim.save(out)
    assert os.path.getsize(out) > 1000


# ---------------------------------------------------------------- video
def test_display_still_image_overlay(tmp_path):
    import cv2

    from socialways_tpu.viz.video import Display, parse_annotations

    np.savetxt(str(tmp_path / "H.txt"), np.eye(3))
    cv2.imwrite(str(tmp_path / "reference.jpg"),
                np.full((100, 100, 3), 60, np.uint8))
    d = Display(str(tmp_path))
    assert d.grab_frame(0)
    d.plot_ped((50, 50), pid=1)
    d.plot_path(np.array([[10.0, 10.0], [20.0, 20.0]]), args="g--")
    d.add_orig_frame(0.5)
    out = str(tmp_path / "out.png")
    d.save(out)
    im = cv2.imread(out)
    assert im.std() > 0.5  # something was drawn

    rows = ["0.0 1.0 5.0 0.0 6.0 0.1 0.0 0.1",
            "0.0 2.0 7.0 0.0 8.0 0.1 0.0 0.1",
            "10.0 1.0 5.5 0.0 6.5 0.1 0.0 0.1"]
    (tmp_path / "obsmat.txt").write_text("\n".join(rows) + "\n")
    ts, ids, pos = parse_annotations(str(tmp_path / "obsmat.txt"))
    assert ts.tolist() == [0, 10]
    assert ids[0].tolist() == [1, 2] and ids[1].tolist() == [1]
    np.testing.assert_allclose(pos[0][0], [5.0, 6.0])


def test_fake_display_noop():
    from socialways_tpu.viz.video import FakeDisplay

    d = FakeDisplay()
    assert d.grab_frame(0) is False
    d.plot_ped()
    d.plot_path([])
    d.show()


def test_toy_turn_modes_classifier_broadcasts():
    """The shared per-sample classifier behind toy_mode_coverage (also
    imported by benchmarks/dip_diagnosis.py) classifies with -1 off-mode
    and broadcasts leading axes of finals ([codes, K, N, 2])."""
    from socialways_tpu.eval.stats import toy_turn_modes

    n = 3
    obsvs = np.zeros((n, 2, 2), np.float32)
    obsvs[:, 0, 0] = 4.0          # approach angle 0
    finals = np.zeros((2, 5, n, 2), np.float32)   # [codes, K, N, 2]
    for d, (c, k) in [(-16, (0, 0)), (0, (0, 1)), (16, (1, 0)),
                      (45, (1, 1))]:
        a = np.radians(d)
        finals[c, k, :] = [np.cos(a), np.sin(a)]
    modes = toy_turn_modes(obsvs, finals)
    assert modes.shape == (2, 5, n)
    assert (modes[0, 0] == 0).all() and (modes[0, 1] == 1).all()
    assert (modes[1, 0] == 2).all() and (modes[1, 1] == -1).all()


def test_toy_mode_coverage_metric():
    from socialways_tpu.eval.stats import toy_mode_coverage

    # agents approaching from +x (angle 0); modes at -16/0/+16 deg
    n, t = 4, 3
    obsvs = np.zeros((n, 2, 2), np.float32)
    obsvs[:, 0, 0] = 4.0          # approach angle 0
    obsvs[:, 1, 0] = 3.0

    def traj_at(deg):
        a = np.radians(deg)
        out = np.zeros((t, 2), np.float32)
        out[-1] = [np.cos(a), np.sin(a)]
        return out

    # K=3 samples hitting all three modes for every agent → coverage 1
    pk = np.stack([np.stack([traj_at(d)] * n) for d in (-16, 0, 16)])
    assert toy_mode_coverage(obsvs, pk) == 1.0
    # collapsed: all samples on one mode → 1/3
    pk1 = np.stack([np.stack([traj_at(0)] * n)] * 3)
    assert toy_mode_coverage(obsvs, pk1) == pytest.approx(1 / 3)
    # off all modes → 0
    pk0 = np.stack([np.stack([traj_at(45)] * n)] * 3)
    assert toy_mode_coverage(obsvs, pk0) == 0.0


def test_stats_curve_plot(tmp_path, toy_npz):
    """cli stats --plot: multi-run EMD/1-NN curve figure renders
    (calc_statistics.py:122-144 parity)."""
    from socialways_tpu.io.dumps import dump_predictions
    from socialways_tpu.viz.stats_plots import plot_stats_curves

    real = load_real_samples(toy_npz, group=6)
    rng = np.random.RandomState(0)
    runs = []
    for run in ("a", "b"):
        for epoch in (50, 100):
            preds_k = real[:20, :, 2:] + rng.randn(20, 6,
                                                   real.shape[2] - 2,
                                                   2) * 0.05
            d = str(tmp_path / run / str(epoch))
            dump_predictions(d, epoch, 0, real[0, :, :2], preds_k,
                             real[0, :, 2:], real[0, :, 2:])
        calc_and_store_stats(str(tmp_path / run), real, num_samples=20,
                             min_peds=3)
        runs.append(str(tmp_path / run))

    out = plot_stats_curves(runs, str(tmp_path / "curves.png"),
                            labels=["variant-a", "variant-b"],
                            iters_per_epoch=3)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 10000
