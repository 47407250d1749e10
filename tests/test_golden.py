"""Golden-checkpoint regression tests.

A frozen trained checkpoint (tests/fixtures/golden_toy_h16.npz — 20 epochs
of seeded L2+GAN on the seed-30 toy set) plus its recorded metrics.  If any
of parser math, model wiring, rollout semantics, eval math, or checkpoint
I/O drifts, these values move — catching silent regressions across rounds
and library upgrades.
"""

import json
import os

import numpy as np
import jax
import pytest

from socialways_tpu.config import TrainConfig
from socialways_tpu.data.dataset import load_npz_dataset
from socialways_tpu.data.toy import make_toy_npz_arrays
from socialways_tpu.engine import Trainer
from socialways_tpu.io.checkpoint import restore_checkpoint

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
CKPT = os.path.join(FIXTURES, "golden_toy_h16.npz")
METRICS = os.path.join(FIXTURES, "golden_toy_h16_metrics.json")

CFG = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                  batch_size=64, n_unrolling_steps=1, seed=123,
                  use_l2_loss=True, lr_g=1e-3)


@pytest.fixture(scope="module")
def golden_ds(tmp_path_factory):
    p = tmp_path_factory.mktemp("golden") / "toy.npz"
    np.savez(p, **make_toy_npz_arrays())
    return load_npz_dataset(str(p))


def test_golden_eval_metrics(golden_ds):
    """Restoring the frozen checkpoint and evaluating with the frozen key
    reproduces the recorded metrics."""
    want = json.load(open(METRICS))
    tr = Trainer(CFG, golden_ds)
    state, epoch, _, scale = restore_checkpoint(CKPT, tr.init_state())
    assert epoch == 20
    assert scale is not None and scale.sx == pytest.approx(golden_ds.ss)

    ev = tr.evaluate(state, jax.random.PRNGKey(777), n_gen_samples=8)
    for key in ("ade_avg", "fde_avg", "ade_min", "fde_min"):
        assert ev[key] == pytest.approx(want[key], rel=2e-3), key


def test_golden_retraining_reproduces(golden_ds):
    """Re-running the recorded training recipe from scratch lands on the
    recorded train metrics — full-pipeline determinism."""
    want = json.load(open(METRICS))
    tr = Trainer(CFG, golden_ds)
    state = tr.init_state()
    rng = jax.random.PRNGKey(123)
    for _ in range(20):
        rng, sub = jax.random.split(rng)
        state, m = tr.train_epoch(state, sub)
    assert m["train_ade"] == pytest.approx(want["train_ade"], rel=2e-3)
    assert m["train_fde"] == pytest.approx(want["train_fde"], rel=2e-3)
