"""LOO protocol-parity invariants on tiny synthetic obsmat scenes.

These pin the semantics that benchmarks/ethucy_parity.py relies on:
merge_scenes (our LOO runner) must equal loading a merged fold npz (the
path the unmodified reference consumes), and the fold construction must
place the held-out scene exactly in the reference's hard-coded 4/5 test
split (train.py:95-98)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.synth_ethucy import (  # noqa: E402
    SCENES,
    build_all,
    make_scene,
    merge_fold,
    scene_npz,
    write_obsmat,
)


def _tiny_scenes(tmp_path):
    out = str(tmp_path / "scenes")
    os.makedirs(out, exist_ok=True)
    counts = {}
    for scene in SCENES:
        om = os.path.join(out, f"obsmat_{scene}.txt")
        write_obsmat(make_scene(scene, n_agents=30, seed=1), om)
        counts[scene] = scene_npz(om, os.path.join(out,
                                                   f"{scene}-8-12.npz"))
    B = min(counts.values())
    for scene in SCENES:
        scene_npz(os.path.join(out, f"obsmat_{scene}.txt"),
                  os.path.join(out, f"{scene}-8-12.npz"), trim_batches=B)
    return out, B


def test_obsmat_roundtrip_through_production_parser(tmp_path):
    """Synthetic obsmat rows parse through BIWIParser into full windows."""
    out, B = _tiny_scenes(tmp_path)
    d = np.load(os.path.join(out, "eth-8-12.npz"))
    assert d["obsvs"].shape[1:] == (8, 2)
    assert d["preds"].shape[1:] == (12, 2)
    assert len(d["batches"]) == B > 5
    # windows are contiguous position sequences (velocities sane)
    step = np.diff(np.concatenate([d["obsvs"], d["preds"]], axis=1), axis=1)
    assert np.abs(step).max() < 2.0          # < 2 m per 0.4 s


def test_fold_puts_heldout_exactly_in_reference_test_split(tmp_path):
    out, B = _tiny_scenes(tmp_path)
    files = [os.path.join(out, f"{s}-8-12.npz") for s in SCENES]
    fold = os.path.join(out, "fold_eth.npz")
    info = merge_fold(files[1:], files[0], fold)
    d = np.load(fold)
    n_batches = len(d["batches"])
    # the reference's split boundary (train.py:95-98)
    train_size = (n_batches * 4) // 5
    assert train_size == 4 * info["batches_per_scene"]
    assert int(d["batches"][train_size - 1][1]) == info["n_train_samples"]


def test_merge_scenes_equals_fold_npz(tmp_path):
    """Our LOO runner's merge == the reference-protocol merged npz,
    bit for bit (multi-scene normalization semantics, VERDICT r1 w3)."""
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine.ethucy import merge_scenes

    out, _ = _tiny_scenes(tmp_path)
    files = [os.path.join(out, f"{s}-8-12.npz") for s in SCENES]
    fold = os.path.join(out, "fold_zara2.npz")
    merge_fold(files[:-1], files[-1], fold)

    ds_a = merge_scenes(files[:-1], files[-1])
    ds_b = load_npz_dataset(fold)
    assert ds_a.train_size == ds_b.train_size
    np.testing.assert_array_equal(ds_a.obsvs, ds_b.obsvs)
    np.testing.assert_array_equal(ds_a.preds, ds_b.preds)
    np.testing.assert_array_equal(np.asarray(ds_a.batches),
                                  np.asarray(ds_b.batches))
    assert abs(ds_a.ss - ds_b.ss) < 1e-12


def test_auto_discovery_prepares_and_runs_loo(tmp_path):
    """The unattended readiness path (cli eth-ucy on a raw --data-dir):
    obsmat files in a standard public layout are discovered, format-
    validated, fingerprinted and windowed; invalid decoys are skipped; the
    LOO protocol then runs on the built npz with zero ceremony."""
    from socialways_tpu.cli.main import main as cli_main
    from socialways_tpu.engine.ethucy import discover_obsmat, validate_obsmat

    data = tmp_path / "raw"
    layout = {
        "eth": data / "ewap_dataset" / "seq_eth" / "obsmat.txt",
        "hotel": data / "ewap_dataset" / "seq_hotel" / "obsmat.txt",
        "univ": data / "crowds" / "students003" / "obsmat.txt",
        "zara1": data / "crowds" / "zara01" / "obsmat.txt",
        "zara2": data / "obsmat_zara2.txt",
    }
    for scene, path in layout.items():
        os.makedirs(path.parent, exist_ok=True)
        write_obsmat(make_scene(scene, n_agents=30, seed=1), str(path))
    # a decoy that must fail validation (wrong column count)
    decoy = data / "notes_obsmat.txt"
    decoy.write_text("1 2 3\n4 5 6\n")

    # scene tokens match at DELIMITER boundaries: an obsmat directly
    # under a dir named 'ethucy' (the dataset's common umbrella name)
    # must be unclassified, not mapped to scene 'eth' — which would
    # collide with the real seq_eth file and block the whole layout
    umbrella = data / "ethucy" / "obsmat.txt"
    os.makedirs(umbrella.parent, exist_ok=True)
    write_obsmat(make_scene("eth", n_agents=30, seed=2), str(umbrella))

    found = discover_obsmat(str(data))
    assert {s: os.path.abspath(p) for s, p in found.items()} == {
        s: os.path.abspath(str(p)) for s, p in layout.items()}
    v = validate_obsmat(str(layout["eth"]))
    assert v["ok"] and len(v["sha256"]) == 64
    assert not validate_obsmat(str(decoy))["ok"]

    out_json = str(tmp_path / "loo.json")
    # full auto path: discovery + build via --prepare-only (all 5 scenes)
    assert cli_main(["eth-ucy", "--data-dir", str(data), "--prepare-only",
                     "--out-json", out_json]) == 0
    import json as _json
    with open(out_json) as fh:
        manifest = _json.load(fh)["scenes"]
    for s in ("eth", "hotel", "univ", "zara1", "zara2"):
        assert os.path.exists(manifest[s]["npz"])
        assert manifest[s]["built"]
        assert manifest[s]["sha256"] == validate_obsmat(
            str(layout[s]))["sha256"]

    # tiny end-to-end LOO through the SAME cli on two scenes
    assert cli_main(["eth-ucy", "--data-dir", str(data),
                     "--scenes", "eth,hotel", "--epochs", "1",
                     "--h-size", "16", "--batch-size", "64", "--k", "2",
                     "--out-json", out_json]) == 0
    with open(out_json) as fh:
        res = _json.load(fh)["folds"]
    for scene in ("eth", "hotel"):
        assert np.isfinite(res[scene]["ade_min"])


@pytest.mark.slow
def test_loo_eval_every_best_tracking_and_stall_rescue(tmp_path,
                                                       monkeypatch):
    """run_leave_one_out with eval_every: periodic held-out evals, best-
    checkpoint keys (best_ade_min/best_fde_min/best_at_epoch) in the
    results, and the ADE-keyed stall rescue (restore best + fresh D).
    A strictly non-improving evaluate forces the rescue on every eval
    except the last (no pointless rescue at run end) and pins the best
    at the first eval."""
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.engine.ethucy import run_leave_one_out
    from socialways_tpu.engine.trainer import Trainer

    out, _ = _tiny_scenes(tmp_path)
    evals = []

    def const_eval(self, state, rng, n_gen_samples=None):
        evals.append(1)
        return {"ade_min": 1.0, "fde_min": 2.0,
                "ade_avg": 1.0, "fde_avg": 2.0}

    monkeypatch.setattr(Trainer, "evaluate", const_eval)
    cfg = TrainConfig(n_epochs=4, hidden_size=16, social_feature_size=16,
                      noise_len=8, batch_size=64, n_gen_samples=2)
    res = run_leave_one_out(out, cfg, scenes=("eth", "hotel"),
                            fused_block=2, eval_every=1,
                            ade_stall_recover=1, ade_stall_grace=0,
                            ade_stall_max_rescues=0, verbose=False)
    for scene in ("eth", "hotel"):
        r = res[scene]
        assert r["ade_min"] == 1.0                      # final eval keys
        assert r["best_ade_min"] == 1.0
        assert r["best_fde_min"] == 2.0
        assert r["best_at_epoch"] == 1                  # first eval wins
        # evals at 1,2,3,4: stall fires at 2 and 3; 4 is run end
        assert r["rescues"] == [2, 3]
    # 4 in-training evals per fold; the final eval REUSES the last
    # in-loop eval (same state, epochs aligned) instead of re-drawing
    assert len(evals) == 2 * 4
