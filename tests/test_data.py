"""Data layer tests: Scale, parsers, windowing, toy generator, packing."""

import numpy as np
import pytest

from socialways_tpu.data import (
    BIWIParser,
    Scale,
    TrajnetParser,
    create_dataset,
    load_npz_dataset,
)
from socialways_tpu.data.dataset import greedy_chunks, pack_scene_batches
from socialways_tpu.data.toy import make_toy_npz_arrays


# ---------------------------------------------------------------- Scale
def test_scale_round_trip():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-5, 12, size=(40, 7, 2))
    s = Scale().fit(pts)
    s.calc_scale(keep_ratio=True)
    norm = s.normalize(pts)
    assert norm.min() >= -1e-6 and norm.max() <= 1.0 + 1e-6
    back = s.denormalize(norm)
    np.testing.assert_allclose(back, pts, rtol=1e-6, atol=1e-6)


def test_scale_keep_ratio_uses_min_scale():
    s = Scale()
    s.min_x, s.max_x = 0.0, 2.0   # sx = 0.5
    s.min_y, s.max_y = 0.0, 10.0  # sy = 0.1
    s.calc_scale(keep_ratio=True)
    assert s.sx == s.sy == pytest.approx(0.1)
    s.calc_scale(keep_ratio=False)
    assert s.sx == pytest.approx(0.5) and s.sy == pytest.approx(0.1)


def test_scale_all_ranks():
    s = Scale()
    s.min_x, s.max_x, s.min_y, s.max_y = 0.0, 4.0, 0.0, 4.0
    s.calc_scale()
    for shape in [(2,), (3, 2), (3, 4, 2), (3, 4, 5, 2)]:
        x = np.full(shape, 2.0)
        n = s.normalize(x)
        np.testing.assert_allclose(n, 0.5)
        np.testing.assert_allclose(s.denormalize(n), 2.0)
    # no-shift mode scales without translating
    np.testing.assert_allclose(s.normalize(np.array([4.0, 4.0]), shift=False),
                               [1.0, 1.0])


# -------------------------------------------------------------- parsers
def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_biwi_parser(tmp_path):
    # obsmat rows: ts id px pz py vx vz vy  (pos from cols 2,4; vel 5,7)
    rows = []
    for k in range(4):
        t = 10 * (k + 1)
        rows.append(f"{t}.0 1.0 {1.0 + k} 0.0 {2.0 + k} 0.5 0.0 0.25")
    rows.append("20.0 2.0 5.0 0.0 6.0 -1.0 0.0 -2.0")
    f = _write(tmp_path, "obsmat.txt", rows)
    p = BIWIParser()
    p.load(f)
    assert len(p.p_data) == 2
    np.testing.assert_allclose(p.p_data[0][0], [1.0, 2.0])
    np.testing.assert_allclose(p.v_data[0][0], [0.5, 0.25])
    np.testing.assert_allclose(p.p_data[1][0], [5.0, 6.0])
    assert p.interval == 10          # auto-detected frame interval
    assert p.min_t == 10 and p.max_t == 40
    # scale covers x in [1,5], y in [2,6] with keep-ratio
    assert p.scale.sx == pytest.approx(0.25)


def test_biwi_down_sample(tmp_path):
    rows = [f"{t}.0 1.0 {t} 0.0 {t} 0.0 0.0 0.0" for t in range(1, 9)]
    f = _write(tmp_path, "obsmat.txt", rows)
    p = BIWIParser()
    p.load(f, down_sample=2)
    assert [int(t) for t in p.t_data[0]] == [2, 4, 6, 8]


def test_trajnet_parser_glob(tmp_path):
    _write(tmp_path, "a.txt", ["0 1 0.0 0.0", "1 1 1.0 1.0"])
    _write(tmp_path, "b.txt", ["0 2 2.0 2.0"])
    p = TrajnetParser()
    p.load(str(tmp_path) + "/*.txt")
    assert len(p.p_data) == 2
    assert sorted(p.all_ids) == [1, 2]


def _sdd_row(aid, x1, y1, x2, y2, ts, label="Pedestrian"):
    # real SDD annotation rows: id xmin ymin xmax ymax frame lost occluded
    # generated "label" (quoted string last — the column that disables the
    # numeric fast path)
    return f'{aid} {x1} {y1} {x2} {y2} {ts} 0 0 0 "{label}"'


def test_sdd_parser_bbox_center_and_downsample(tmp_path):
    """Bbox-center/round()/every-12th-frame math of the reference
    SDD_Parsrer (parse_utils.py:150-228)."""
    from socialways_tpu.data import SDDParser

    rows = [
        _sdd_row(7, 10.4, 20.6, 30.4, 40.6, 0),     # kept: ts % 12 == 0
        _sdd_row(7, 11.0, 21.0, 31.0, 41.0, 5),     # dropped: ts % 12 != 0
        _sdd_row(7, 14.0, 24.0, 34.0, 44.0, 12),    # kept
        _sdd_row(9, 0.0, 0.0, 100.0, 50.0, 12, label="Biker"),
        "1 2 3",                                     # short row: skipped
    ]
    f = _write(tmp_path, "annotations.txt", rows)
    p = SDDParser()
    p.load(f)                                        # default down_sample=12
    assert p.actual_fps == 2.5 and p.interval == 12
    assert p.all_ids == [7, 9]
    # round() BEFORE centering: (round(10.4)+round(30.4))/2 = 20,
    # (round(20.6)+round(40.6))/2 = 31
    np.testing.assert_allclose(p.p_data[0], [[20.0, 31.0], [24.0, 34.0]])
    np.testing.assert_allclose(p.p_data[1], [[50.0, 25.0]])
    assert [int(t) for t in p.t_data[0]] == [0, 12]
    assert p.min_t == 0 and p.max_t == 12
    # keep-ratio scale over x in [20,50], y in [25,34]
    assert p.scale.sx == pytest.approx(1.0 / 30.0)
    assert p.scale.sy == pytest.approx(1.0 / 30.0)


def test_sdd_parser_glob_and_custom_downsample(tmp_path):
    from socialways_tpu.data import SDDParser

    _write(tmp_path, "video0.txt",
           [_sdd_row(1, 0, 0, 2, 2, t) for t in range(0, 7)])
    _write(tmp_path, "video1.txt",
           [_sdd_row(2, 4, 4, 6, 6, 0), _sdd_row(2, 6, 6, 8, 8, 3)])
    p = SDDParser()
    p.load(str(tmp_path) + "/*.txt", down_sample=3)
    assert sorted(p.all_ids) == [1, 2]
    assert [int(t) for t in p.t_data[0]] == [0, 3, 6]
    assert [int(t) for t in p.t_data[1]] == [0, 3]


def test_sdd_reference_alias():
    """The reference's (sic) class name resolves to our parser."""
    from socialways_tpu.data import SDDParser
    from socialways_tpu.data.parsers import SDD_Parsrer
    assert SDD_Parsrer is SDDParser


# ------------------------------------------------------------ windowing
def test_create_dataset_windows():
    # one agent, 20 consecutive frames at interval 1, positions = (t, -t)
    ts = np.arange(20)
    pos = np.stack([ts.astype(float), -ts.astype(float)], axis=1)
    obsvs, preds, times, batches = create_dataset(
        [pos], [ts], range(0, 20, 1), n_past=8, n_next=12)
    # full past needs t >= 8, full future needs t <= 8 → t == 8 only
    assert obsvs.shape == (1, 8, 2) and preds.shape == (1, 12, 2)
    np.testing.assert_allclose(obsvs[0][:, 0], np.arange(0, 8))
    np.testing.assert_allclose(preds[0][:, 0], np.arange(8, 20))
    assert times == [8]
    assert batches.tolist() == [[0, 1]]


def test_create_dataset_scene_grouping():
    # two agents co-present: every valid anchor groups both into one scene
    ts = np.arange(0, 40, 2)  # interval-2 frames
    posA = np.stack([ts.astype(float), ts.astype(float)], 1)
    posB = posA + 100.0
    obsvs, preds, times, batches = create_dataset(
        [posA, posB], [ts, ts], range(0, 40, 2), n_past=8, n_next=12)
    # valid anchors: t in {16}: t-16 >= 0 and t+22 <= 38 → t = 16 only
    assert obsvs.shape[0] == 2
    assert batches.tolist() == [[0, 2]]
    assert times == [16, 16]


# ------------------------------------------------------------------ toy
def test_toy_deterministic_and_schema(toy_arrays):
    d = toy_arrays
    assert d["obsvs"].shape == (216, 2, 2)
    assert d["preds"].shape == (216, 2, 2)
    assert d["times"].shape == (216,)
    # 6 conditions × 36 t0 values each, n_per_batch=6 → every batch holds the
    # 6 conditions' samples sharing a t0
    assert d["batches"].shape[1] == 2
    sizes = d["batches"][:, 1] - d["batches"][:, 0]
    assert sizes.sum() == 216
    # first two points sit exactly on radii 1.0 and 0.75 (4/4 and 3/4)
    r0 = np.linalg.norm(d["obsvs"][:, 0], axis=1)
    r1 = np.linalg.norm(d["obsvs"][:, 1], axis=1)
    np.testing.assert_allclose(r0, 1.0, atol=1e-6)
    np.testing.assert_allclose(r1, 0.75, atol=1e-6)
    # deterministic under the fixed seed
    d2 = make_toy_npz_arrays(seed=30)
    np.testing.assert_array_equal(d["obsvs"], d2["obsvs"])
    np.testing.assert_array_equal(d["preds"], d2["preds"])


def test_toy_mode_structure():
    d = make_toy_npz_arrays(n_samples=36, n_conditions=1, n_modes=3,
                            n_per_batch=1, seed=0)
    # single condition at angle 0: all observations on +x axis
    np.testing.assert_allclose(d["obsvs"][:, 0, 1], 0.0, atol=1e-9)
    # three distinct turn modes in the predictions (±16°, 0°)
    angles = np.arctan2(d["preds"][:, 1, 1], d["preds"][:, 1, 0])
    centers = np.sort([angles[i::3].mean() for i in range(3)])
    np.testing.assert_allclose(
        centers, [-16 * np.pi / 180, 0.0, 16 * np.pi / 180], atol=0.02)


# -------------------------------------------------------- load + packing
def test_load_npz_dataset(toy_npz):
    ds = load_npz_dataset(toy_npz)
    assert ds.n_past == 2 and ds.n_next == 2
    assert ds.train_size == max(1, (len(ds.batches) * 4) // 5)
    assert 0.0 <= ds.obsvs.min() and ds.obsvs.max() <= 1.0 + 1e-6
    assert ds.n_train_samples + ds.n_test_samples == ds.obsvs.shape[0]


def test_greedy_chunks_matches_reference_rule():
    batches = np.array([[0, 3], [3, 6], [6, 8], [8, 13], [13, 14]])
    # batch_size 8: 3 → +3=6 → +2=8 (6+2 ≤ 8, keep) → next 5 would exceed,
    # close; then 5 → +1=6 ≤ 8, keep → end of batches closes the chunk
    chunks = greedy_chunks(batches, 8)
    assert chunks == [[0, 1, 2], [3, 4]]
    # a single over-size scene still forms its own chunk
    assert greedy_chunks(np.array([[0, 10]]), 4) == [[0]]


def test_pack_scene_batches(toy_npz):
    ds = load_npz_dataset(toy_npz)
    packed = pack_scene_batches(ds.obsvs[:ds.n_train_samples],
                                ds.preds[:ds.n_train_samples],
                                ds.train_batches, batch_size=32)
    assert packed.obsvs.shape[1] == packed.width >= 32
    assert packed.valid.sum() == ds.n_train_samples
    # scene ids: padding is -1, each chunk's scenes are locally 0..k
    assert (packed.scene_ids[~packed.valid] == -1).all()
    assert (packed.scene_ids[packed.valid] >= 0).all()
    # unpacked content matches the original arrays per chunk
    flat_obs = np.concatenate(
        [packed.obsvs[i][packed.valid[i]] for i in range(packed.n_chunks)])
    np.testing.assert_allclose(flat_obs, ds.obsvs[:ds.n_train_samples])


def test_pack_pad_chunks_to():
    batches = np.array([[0, 2], [2, 4], [4, 6]])
    obs = np.zeros((6, 8, 2), np.float32)
    prd = np.zeros((6, 12, 2), np.float32)
    packed = pack_scene_batches(obs, prd, batches, batch_size=2,
                                pad_chunks_to=4)
    assert packed.n_chunks == 4
    assert packed.n_valid.tolist() == [2, 2, 2, 0]


def test_seyfried_parser_and_interval(tmp_path):
    """Seyfried format: header (obstacles + fps), cm→m, finite-diff
    velocities, and post-down-sampling interval auto-detection."""
    from socialways_tpu.data import SeyfriedParser

    lines = ["1", "0.0 0.0 10.0 0.0", "", "16"]
    for aid in (1, 2):
        for k in range(12):
            lines.append(f"{aid} {k} {100.0 + 10 * k} {200.0 + 5 * k} 170.0")
    f = tmp_path / "sey.txt"
    f.write_text("\n".join(lines) + "\n")

    p = SeyfriedParser()
    p_data, v_data, t_data = p.load(str(f), down_sample=4)
    assert len(p_data) == 2
    # cm → m and down-sampling kept t in {0,4,8}
    np.testing.assert_allclose(p_data[0][:, 0], [1.0, 1.4, 1.8])
    assert t_data[0].tolist() == [0, 4, 8]
    assert p.interval == 4          # auto-detected after down-sampling
    assert p.actual_fps == pytest.approx(16 / 4)
    # finite-difference velocity: 0.4 m over 4 frames at 16 fps = 1.6 m/s
    np.testing.assert_allclose(v_data[0][1][0], 0.4 * 16 / 4, rtol=1e-6)


def test_scene_ids_for_rows():
    """Eval-slice scene ids must reproduce the npz batch structure (a
    zeros placeholder would pool social attention over one giant scene —
    the round-4 coverage-eval bug)."""
    from socialways_tpu.data.dataset import TrajectoryDataset
    from socialways_tpu.data.scale import Scale

    batches = np.array([[0, 3], [3, 5], [5, 9]], np.int64)
    ds = TrajectoryDataset(obsvs=np.zeros((9, 2, 2), np.float32),
                           preds=np.zeros((9, 2, 2), np.float32),
                           times=np.arange(9), batches=batches,
                           scale=Scale(), train_size=2)
    np.testing.assert_array_equal(ds.scene_ids_for_rows(0, 9),
                                  [0, 0, 0, 1, 1, 2, 2, 2, 2])
    # a mid-batch slice keeps its batch id; rows past the end are -1
    np.testing.assert_array_equal(ds.scene_ids_for_rows(4, 7),
                                  [1, 2, 2, 2, 2, -1, -1])


def test_forecast_windows():
    """forecast_windows (data/forecast.py): last-n_past observation-only
    windows — interval autodetect, gap rejection, short-history
    rejection, default at_time = latest with a full-history agent, and
    explicit at_time."""
    from socialways_tpu.data.forecast import forecast_windows

    # agent 0: frames 0..90 step 10 (full history everywhere)
    # agent 1: frames 40..90 but MISSING 60 (gap)
    # agent 2: frames 70..90 only (short history)
    t0 = np.arange(0, 100, 10)
    t1 = np.array([40, 50, 70, 80, 90])
    t2 = np.array([70, 80, 90])
    p = [np.stack([t.astype(float), t.astype(float) * 2], -1)
         for t in (t0, t1, t2)]

    obs, idx, at = forecast_windows(p, [t0, t1, t2], n_past=4)
    assert at == 90                       # latest frame qualifies
    np.testing.assert_array_equal(idx, [0])   # 1 has a gap, 2 too short
    np.testing.assert_array_equal(obs[0, :, 0], [60, 70, 80, 90])

    # n_past=3: agents 1 and 2 qualify too (agent 1's gap at 60 sits
    # BEFORE its last-3 window 70/80/90)
    obs, idx, at = forecast_windows(p, [t0, t1, t2], n_past=3)
    np.testing.assert_array_equal(idx, [0, 1, 2])

    # explicit at_time mid-stream: agent 1 needs 50/60/70 but 60 is
    # missing (gap INSIDE the window) -> excluded; agent 2 not yet born
    obs, idx, at = forecast_windows(p, [t0, t1, t2], n_past=3, at_time=70)
    np.testing.assert_array_equal(idx, [0])
    np.testing.assert_array_equal(obs[0, :, 0], [50, 60, 70])

    # nothing qualifies -> ValueError
    with pytest.raises(ValueError):
        forecast_windows(p, [t0, t1, t2], n_past=11)


def test_pack_scene_batches_row_map():
    """row_map records each packed row's original window index (-1 on
    padding) so per-row outputs can be unpacked (cli predict)."""
    obsvs = np.arange(10, dtype=np.float32).reshape(5, 1, 2).repeat(2, 1)
    preds = np.zeros((5, 3, 2), np.float32)
    batches = np.array([[0, 2], [2, 3], [3, 5]], np.int64)
    packed = pack_scene_batches(obsvs, preds, batches, batch_size=3)
    got = {}
    for ci in range(packed.n_chunks):
        for r in np.flatnonzero(packed.valid[ci]):
            orig = int(packed.row_map[ci][r])
            got[orig] = packed.obsvs[ci, r]
    assert sorted(got) == [0, 1, 2, 3, 4]
    for orig, row in got.items():
        np.testing.assert_array_equal(row, obsvs[orig])
    assert (packed.row_map[~packed.valid] == -1).all()
