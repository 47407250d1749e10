"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from socialways_tpu.config import TrainConfig
from socialways_tpu.data.dataset import load_npz_dataset, pack_scene_batches
from socialways_tpu.engine import gan_step, init_train_state
from socialways_tpu.parallel import (
    make_dp_eval_chunk,
    make_dp_train_step,
    make_mesh,
    shard_packed_for_mesh,
)

CFG = TrainConfig(hidden_size=16, social_feature_size=16, noise_len=8,
                  n_past=2, n_next=2, batch_size=8, n_unrolling_steps=1)


def _global_batch(n_dev, width=8, key=0):
    """n_dev scene-aligned shards concatenated along the sample axis."""
    rng = np.random.RandomState(key)
    n = n_dev * width
    ids = np.tile(np.repeat(np.arange(width // 2), 2), n_dev)
    return {
        "obsvs": jnp.asarray(rng.rand(n, CFG.n_past, 2).astype(np.float32)),
        "preds": jnp.asarray(rng.rand(n, CFG.n_next, 2).astype(np.float32)),
        "scene_ids": jnp.asarray(ids.astype(np.int32)),
        "valid": jnp.ones((n,), bool),
    }


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_dp_step_runs_and_replicates(mesh):
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    step = make_dp_train_step(CFG, mesh)
    batch = _global_batch(8)
    new_state, m = step(state, batch, jax.random.PRNGKey(1))
    assert int(m.n_samples) == 64
    assert np.isfinite(float(m.g_loss))
    # updated params are fully replicated (pmean'd grads)
    w = new_state.g_params["embed"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_grads_match_single_device_bigbatch(mesh):
    """8-way DP with count-weighted pmean == one big-batch step, even with
    unevenly padded shards."""
    cfg = CFG.replace(n_unrolling_steps=0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _global_batch(8, key=5)
    # knock out some rows on shard 3 only (uneven padding)
    valid = np.asarray(batch["valid"]).copy()
    valid[3 * 8 + 4:3 * 8 + 8] = False
    ids = np.asarray(batch["scene_ids"]).copy()
    ids[3 * 8 + 4:3 * 8 + 8] = -1
    batch["valid"] = jnp.asarray(valid)
    batch["scene_ids"] = jnp.asarray(ids)

    step = make_dp_train_step(cfg, mesh)
    dp_state, dp_m = step(state, batch, jax.random.PRNGKey(7))

    # single-device oracle: same global batch, same per-shard noise layout.
    # DP folds shard index into the noise key, so replicate that here by
    # constructing the same noise stream is nontrivial; instead verify the
    # structural invariants: same sample counts and finite symmetric update.
    assert int(dp_m.n_samples) == 60
    w = dp_state.g_params["embed"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_eval(mesh):
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    ev = make_dp_eval_chunk(CFG, mesh, k=4)
    batch = _global_batch(8, key=2)
    sums = ev(state.g_params, batch, jax.random.PRNGKey(3))
    assert int(sums.n_samples) == 64
    assert float(sums.ade_min) <= float(sums.ade_avg) + 1e-6


def test_shard_packed_for_mesh(toy_npz, mesh):
    ds = load_npz_dataset(toy_npz)
    packed = pack_scene_batches(ds.obsvs, ds.preds, ds.batches, batch_size=24)
    grouped = shard_packed_for_mesh(packed, mesh)
    n_dev = 8
    assert grouped["obsvs"].shape[1] == n_dev * packed.width
    assert grouped["obsvs"].shape[0] * n_dev >= packed.n_chunks
    # every valid sample survives exactly once
    assert int(np.asarray(grouped["valid"]).sum()) == int(packed.valid.sum())
    # filler rows are marked invalid with scene -1
    v = np.asarray(grouped["valid"]).reshape(-1)
    s = np.asarray(grouped["scene_ids"]).reshape(-1)
    assert ((s[~v] == -1)).all()


def test_dp_step_on_grouped_toy(toy_npz, mesh):
    """End-to-end: toy dataset → grouped shards → scanned DP epochs."""
    ds = load_npz_dataset(toy_npz)
    cfg = CFG.replace(batch_size=24)
    packed = pack_scene_batches(ds.obsvs[:ds.n_train_samples],
                                ds.preds[:ds.n_train_samples],
                                ds.train_batches, cfg.batch_size)
    grouped = shard_packed_for_mesh(packed, mesh)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_dp_train_step(cfg, mesh)
    total = 0
    for g in range(grouped["obsvs"].shape[0]):
        state, m = step(state, {k: v[g] for k, v in grouped.items()},
                        jax.random.PRNGKey(g))
        total += int(m.n_samples)
    assert total == ds.n_train_samples


def test_sharded_social_context_equals_single_device(mesh):
    """Agents-axis sharded attention == the single-device reference, with
    one big scene spanning all 8 shards."""
    from socialways_tpu.models import init_generator
    from socialways_tpu.parallel.agents import make_sharded_social_context
    from socialways_tpu.kernels.social_attention import _xla_reference

    cfg = CFG.replace(hidden_size=32, social_feature_size=32)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}

    rng = np.random.RandomState(0)
    n = 8 * 16          # 16 agents per device
    x4 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    # one giant scene + one spanning scene + padding spread across shards
    ids = np.zeros(n, np.int32)
    ids[40:80] = 1
    ids[-8:] = -1
    ids = jnp.asarray(ids)

    ref = _xla_reference(p, x4, h, ids)
    fn = make_sharded_social_context(p, mesh)
    got = fn(x4, h, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_sharded_crowd_sim_equals_single_device(mesh):
    """Multi-chip crowd simulation == single-device simulation given the
    same noise stream (agents sharded 8 ways, scenes spanning shards)."""
    from socialways_tpu.engine.simulate import (crowd_simulate,
                                                crowd_simulate_sharded)
    from socialways_tpu.models import init_generator

    cfg = CFG.replace(hidden_size=16, social_feature_size=16, noise_len=8,
                      n_past=4, n_next=3, use_social=True)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n, n_windows = 8 * 8, 2
    obsv0 = jnp.asarray(np.cumsum(rng.randn(n, 4, 2) * 0.01, 1)
                        .astype(np.float32))
    ids = np.zeros(n, np.int32)
    ids[20:44] = 1          # one scene spans shards 2..5
    ids[44:] = 2
    ids = jnp.asarray(ids)
    noise = jnp.asarray(rng.rand(n_windows, n, 8).astype(np.float32))

    ref = crowd_simulate(params, obsv0, ids, n_windows,
                         jax.random.PRNGKey(1), cfg, noise=noise)
    got = crowd_simulate_sharded(params, obsv0, ids, n_windows,
                                 jax.random.PRNGKey(1), cfg, mesh,
                                 noise=noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_ring_social_context_equals_gather(mesh):
    """Ring-scheduled (ppermute-streamed) agents-axis attention == the
    all_gather form == the single-device reference."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from socialways_tpu.models import init_generator
    from socialways_tpu.parallel.agents import ring_social_context
    from socialways_tpu.kernels.social_attention import _xla_reference

    cfg = CFG.replace(hidden_size=32, social_feature_size=32)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    p = {"feat_mlp": params["feat_mlp"], "attn_w": params["attn_w"]}

    rng = np.random.RandomState(1)
    n = 8 * 16
    x4 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    h = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    ids = np.zeros(n, np.int32)
    ids[40:80] = 1           # scene spanning shards
    ids[100:101] = 5         # singleton scene (no neighbors -> zeros)
    ids[-8:] = -1            # padding
    ids = jnp.asarray(ids)

    ref = _xla_reference(p, x4, h, ids)
    fn = jax.jit(shard_map(
        lambda a, b, c: ring_social_context(p, a, b, c, "data"),
        mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"), check_vma=False))
    got = fn(x4, h, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_ring_crowd_sim_equals_single_device(mesh):
    """Crowd sim with neighbor_exchange='ring' == single-device sim."""
    from socialways_tpu.engine.simulate import (crowd_simulate,
                                                crowd_simulate_sharded)
    from socialways_tpu.models import init_generator

    cfg = CFG.replace(hidden_size=16, social_feature_size=16, noise_len=8,
                      n_past=4, n_next=3, use_social=True)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n, n_windows = 8 * 8, 2
    obsv0 = jnp.asarray(np.cumsum(rng.randn(n, 4, 2) * 0.01, 1)
                        .astype(np.float32))
    ids = np.zeros(n, np.int32)
    ids[20:44] = 1
    ids[44:] = 2
    ids = jnp.asarray(ids)
    noise = jnp.asarray(rng.rand(n_windows, n, 8).astype(np.float32))

    ref = crowd_simulate(params, obsv0, ids, n_windows,
                         jax.random.PRNGKey(1), cfg, noise=noise)
    got = crowd_simulate_sharded(params, obsv0, ids, n_windows,
                                 jax.random.PRNGKey(1), cfg, mesh,
                                 noise=noise, neighbor_exchange="ring")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_host_chunk_feed_matches_shard_packed(toy_npz, mesh):
    """Multi-host feed (single-process degenerate case): streaming
    host_chunk_feed batches through the DP step produces the same metrics
    as the resident shard_packed_for_mesh layout."""
    from socialways_tpu.parallel import host_chunk_feed

    ds = load_npz_dataset(toy_npz)
    packed = pack_scene_batches(ds.obsvs[:ds.n_train_samples],
                                ds.preds[:ds.n_train_samples],
                                ds.train_batches, batch_size=24)
    cfg = CFG.replace(batch_size=24, n_past=ds.obsvs.shape[1],
                      n_next=ds.preds.shape[1])
    step = make_dp_train_step(cfg, mesh)

    resident = shard_packed_for_mesh(packed, mesh)
    n_groups = resident["obsvs"].shape[0]

    state_a = init_train_state(jax.random.PRNGKey(0), cfg)
    state_b = init_train_state(jax.random.PRNGKey(0), cfg)
    seen = 0
    for g, batch in host_chunk_feed(packed, mesh):
        res_batch = {k: v[g] for k, v in resident.items()}
        for k in res_batch:
            np.testing.assert_array_equal(np.asarray(batch[k]),
                                          np.asarray(res_batch[k]))
        state_a, ma = step(state_a, batch, jax.random.PRNGKey(g))
        state_b, mb = step(state_b, res_batch, jax.random.PRNGKey(g))
        assert float(ma.g_loss) == float(mb.g_loss)
        seen += 1
    assert seen == n_groups


def test_local_group_slice_partitions_evenly():
    from socialways_tpu.parallel import local_group_slice
    got = [local_group_slice(8, pi, 4) for pi in range(4)]
    idx = [list(range(8))[s] for s in got]
    assert sum(idx, []) == list(range(8))


def test_dp_step_matches_single_device_bigbatch_exactly(mesh):
    """With the global-draw-then-slice noise stream, the 8-way DP step
    reproduces the single-device big-batch step: identical metrics and
    updated params (up to float reassociation in the reductions)."""
    cfg = CFG.replace(n_unrolling_steps=1)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _global_batch(8, key=11)
    rng = jax.random.PRNGKey(42)

    step = make_dp_train_step(cfg, mesh)
    dp_state, dp_m = step(state, batch, rng)
    sd_state, sd_m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)

    np.testing.assert_allclose(float(dp_m.g_loss), float(sd_m.g_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(dp_m.d_loss), float(sd_m.d_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(dp_m.ade_sum), float(sd_m.ade_sum),
                               rtol=1e-5)
    assert int(dp_m.n_samples) == int(sd_m.n_samples) == 64
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.g_params, sd_state.g_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.d_params, sd_state.d_params)


def test_dp_step_agent_frame_social_matches_single_device(mesh):
    """agent_frame × use_social under 8-way DP == the single-device step:
    the world-frame social states are captured per shard from its own rows
    (row-aligned with the canonicalization), so the composition must shard
    transparently."""
    cfg = CFG.replace(agent_frame=True, use_social=True)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _global_batch(8, key=13)
    # scene ids must be globally unique per shard: _global_batch repeats
    # them across shards, and the single-device run would then pool
    # attention ACROSS shard boundaries that DP cannot see
    ids = np.asarray(batch["scene_ids"]).reshape(8, -1)
    ids = ids + 100 * np.arange(8)[:, None]
    batch = dict(batch, scene_ids=jnp.asarray(ids.reshape(-1)))
    rng = jax.random.PRNGKey(21)

    step = make_dp_train_step(cfg, mesh)
    dp_state, dp_m = step(state, batch, rng)
    sd_state, sd_m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)

    np.testing.assert_allclose(float(dp_m.g_loss), float(sd_m.g_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(dp_m.d_loss), float(sd_m.d_loss),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.g_params, sd_state.g_params)


def test_dp_step_matches_single_device_with_uneven_padding(mesh):
    """Count-weighted grad pmean: param updates still equal the
    single-device big-batch step when shards carry different padding."""
    cfg = CFG.replace(n_unrolling_steps=0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _global_batch(8, key=5)
    valid = np.asarray(batch["valid"]).copy()
    valid[3 * 8 + 4:3 * 8 + 8] = False
    ids = np.asarray(batch["scene_ids"]).copy()
    ids[3 * 8 + 4:3 * 8 + 8] = -1
    batch["valid"] = jnp.asarray(valid)
    batch["scene_ids"] = jnp.asarray(ids)
    rng = jax.random.PRNGKey(7)

    step = make_dp_train_step(cfg, mesh)
    dp_state, dp_m = step(state, batch, rng)
    sd_state, sd_m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)

    assert int(dp_m.n_samples) == int(sd_m.n_samples) == 60
    np.testing.assert_allclose(float(dp_m.ade_sum), float(sd_m.ade_sum),
                               rtol=1e-5)
    # loss METRICS are the count-weighted global masked mean — an
    # unweighted pmean would let lightly-filled shards dilute them
    np.testing.assert_allclose(float(dp_m.d_loss), float(sd_m.d_loss),
                               rtol=2e-4)
    np.testing.assert_allclose(float(dp_m.g_loss), float(sd_m.g_loss),
                               rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.g_params, sd_state.g_params)


def test_mesh_epoch_fn_matches_dp_step_loop(toy_npz, mesh):
    """The fused DP epoch (shard_map around the chunk-group scan) ==
    a host loop of DP steps over the same groups and keys."""
    from socialways_tpu.parallel import make_dp_epoch_fn

    ds = load_npz_dataset(toy_npz)
    cfg = CFG.replace(batch_size=24, n_past=ds.obsvs.shape[1],
                      n_next=ds.preds.shape[1])
    packed = pack_scene_batches(ds.obsvs[:ds.n_train_samples],
                                ds.preds[:ds.n_train_samples],
                                ds.train_batches, cfg.batch_size)
    grouped = shard_packed_for_mesh(packed, mesh)
    state0 = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(3)

    epoch_fn, _ = make_dp_epoch_fn(cfg, mesh)
    fused_state, fused_m = epoch_fn(state0, grouped, rng)

    step = make_dp_train_step(cfg, mesh)
    n_groups = grouped["obsvs"].shape[0]
    keys = jax.random.split(rng, n_groups)      # same split as epoch_fn
    state = state0
    n_total = 0
    for g in range(n_groups):
        state, m = step(state, {k: v[g] for k, v in grouped.items()},
                        keys[g])
        n_total += int(m.n_samples)

    assert int(fused_m.n_samples) == n_total == ds.n_train_samples
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        fused_state.g_params, state.g_params)


def test_mesh_trainer_end_to_end(toy_npz, mesh):
    """Trainer(mesh=...): fused epochs + eval run DP and train the toy."""
    from socialways_tpu.engine import Trainer

    ds = load_npz_dataset(toy_npz)
    cfg = CFG.replace(batch_size=24, n_epochs=4)
    tr = Trainer(cfg, ds, mesh=mesh)
    state = tr.init_state()
    rng = jax.random.PRNGKey(0)

    state, m = tr.train_epochs(state, rng, 4)
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["train_ade"])
    assert m["steps"] == tr.n_steps_per_epoch * 4

    ev = tr.evaluate(state, jax.random.PRNGKey(1), n_gen_samples=4)
    assert np.isfinite(ev["ade_min"])
    assert ev["ade_min"] <= ev["ade_avg"] + 1e-9

    state, m1 = tr.train_epoch(state, jax.random.PRNGKey(2))
    assert np.isfinite(m1["g_loss"])


def test_dp_eval_matches_single_device_exactly(mesh):
    """Sharded K-sample eval slices the global noise draw, so its sums
    equal the single-device eval_chunk on the same global batch."""
    from socialways_tpu.eval.metrics import eval_chunk

    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _global_batch(8, key=9)
    rng = jax.random.PRNGKey(21)

    ev = make_dp_eval_chunk(CFG, mesh, k=4)
    dp = ev(state.g_params, batch, rng)
    sd = jax.jit(lambda p, b, r: eval_chunk(p, b, r, 4, CFG))(
        state.g_params, batch, rng)

    assert int(dp.n_samples) == int(sd.n_samples) == 64
    for a, b in zip(dp[:4], sd[:4]):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_dp_instance_noise_matches_single_device(mesh):
    """d_input_noise draws the GLOBAL batch's eps on every shard and slices
    local rows (like draw_noise), so the DP step consumes exactly the
    single-device noise stream — updates match the big-batch step."""
    cfg = CFG.replace(n_unrolling_steps=0, d_input_noise=0.3)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _global_batch(8, key=9)
    dp_state, dp_m = make_dp_train_step(cfg, mesh)(
        state, batch, jax.random.PRNGKey(11))
    sd_state, sd_m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, jax.random.PRNGKey(11))
    assert float(dp_m.d_loss) == pytest.approx(float(sd_m.d_loss), rel=1e-5)
    assert float(dp_m.g_loss) == pytest.approx(float(sd_m.g_loss), rel=1e-5)
    for dp_w, sd_w in zip(
            jax.tree_util.tree_leaves(dp_state.g_params),
            jax.tree_util.tree_leaves(sd_state.g_params)):
        np.testing.assert_allclose(np.asarray(dp_w), np.asarray(sd_w),
                                   rtol=2e-5, atol=2e-6)


# ------------------------------------------------- hierarchical (dcn, data)
def test_hierarchical_mesh_matches_flat_dp():
    """2x4 (dcn, data) hierarchical DP == flat 8-device DP on identical
    inputs: devices are laid out dcn-major so both forms slice the same
    global noise stream, and the grad pmean over the axis tuple reduces
    the same terms (XLA picks the hierarchical collective lowering)."""
    from socialways_tpu.parallel import (make_mesh, make_mesh_2d,
                                         make_dp_eval_chunk,
                                         make_dp_train_step)
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _global_batch(8, key=11)
    rng = jax.random.PRNGKey(1)

    flat = make_dp_train_step(CFG, make_mesh(8))
    hier = make_dp_train_step(CFG, make_mesh_2d(2, 4))
    s_f, m_f = flat(state, batch, rng)
    s_h, m_h = hier(state, batch, rng)
    assert int(m_h.n_samples) == int(m_f.n_samples) == 64
    assert float(m_h.g_loss) == pytest.approx(float(m_f.g_loss), rel=1e-5)
    assert float(m_h.d_loss) == pytest.approx(float(m_f.d_loss), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_h.g_params["embed"]["w"]),
        np.asarray(s_f.g_params["embed"]["w"]), rtol=1e-5, atol=1e-7)
    # replicated across every device of the 2-D mesh
    shards = [np.asarray(x.data)
              for x in s_h.g_params["embed"]["w"].addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    ev_f = make_dp_eval_chunk(CFG, make_mesh(8), k=4)
    ev_h = make_dp_eval_chunk(CFG, make_mesh_2d(2, 4), k=4)
    sums_f = ev_f(state.g_params, batch, jax.random.PRNGKey(3))
    sums_h = ev_h(state.g_params, batch, jax.random.PRNGKey(3))
    assert float(sums_h.ade_min) == pytest.approx(float(sums_f.ade_min),
                                                  rel=1e-5)
    assert int(sums_h.n_samples) == int(sums_f.n_samples) == 64


def test_hierarchical_fused_epochs_matches_flat():
    """The production fused-epochs DP path produces identical metrics on
    the 2x4 hierarchical mesh and the flat 8-device mesh."""
    from socialways_tpu.parallel import (make_dp_epochs_fn, make_mesh,
                                         make_mesh_2d)
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _global_batch(8, key=21)
    grouped = {k: jnp.stack([v, v]) for k, v in batch.items()}
    rng = jax.random.PRNGKey(4)
    s_f, m_f = make_dp_epochs_fn(CFG, make_mesh(8))(
        state, grouped, rng, n=2)
    s_h, m_h = make_dp_epochs_fn(CFG, make_mesh_2d(2, 4))(
        state, grouped, rng, n=2)
    assert int(m_h.n_samples) == int(m_f.n_samples)
    assert float(m_h.g_loss) == pytest.approx(float(m_f.g_loss), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_h.g_params["embed"]["w"]),
        np.asarray(s_f.g_params["embed"]["w"]), rtol=1e-5, atol=1e-7)


def test_dp_step_with_grad_accum(mesh):
    """--mesh composes with --grad-accum: each shard scans its own
    micro-chunks, gradients pmean once per phase; counts and finiteness
    match the accum-free step."""
    cfg = CFG.replace(grad_accum=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _global_batch(8, key=31)
    s_a, m_a = make_dp_train_step(cfg, mesh)(state, batch,
                                             jax.random.PRNGKey(2))
    s_p, m_p = make_dp_train_step(CFG.replace(n_unrolling_steps=1), mesh)(
        state, batch, jax.random.PRNGKey(2))
    assert int(m_a.n_samples) == int(m_p.n_samples) == 64
    assert np.isfinite(float(m_a.g_loss))
    # same loss value up to reassociation (identical math, chunked)
    assert float(m_a.g_loss) == pytest.approx(float(m_p.g_loss), rel=1e-4)
    w = s_a.g_params["embed"]["w"]
    shards = [np.asarray(x.data) for x in w.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)


def test_pallas_dispatch_under_mesh(mesh, monkeypatch):
    """--pallas composes with --mesh: the fused social-attention kernel
    (interpret mode on CPU) dispatches inside the shard_map DP step, fwd
    AND bwd (custom_vjp), and the result equals (a) the single-device
    fused step on the same global batch and (b) the mesh XLA path within
    kernel tolerance.  Closes the round-2 gap: kernels were tested only
    standalone, never under the production mesh step."""
    import importlib
    # the kernels package re-exports a FUNCTION named social_attention,
    # shadowing the submodule on attribute access — resolve via importlib
    sa = importlib.import_module(
        "socialways_tpu.kernels.social_attention")
    monkeypatch.setattr(sa, "_FWD_INTERPRET", True)
    monkeypatch.setattr(sa, "_BWD_INTERPRET", True)

    # globally-unique scene ids: scenes never span shards, so per-shard
    # pooling == single-device pooling on the global batch
    n_dev, width = 8, 8
    n = n_dev * width
    rng_np = np.random.RandomState(3)
    batch = {
        "obsvs": jnp.asarray(rng_np.rand(n, 2, 2).astype(np.float32)),
        "preds": jnp.asarray(rng_np.rand(n, 2, 2).astype(np.float32)),
        "scene_ids": jnp.asarray(np.repeat(np.arange(n // 2), 2)
                                 .astype(np.int32)),
        "valid": jnp.ones((n,), bool),
    }
    cfg = TrainConfig(hidden_size=64, social_feature_size=64, noise_len=32,
                      n_past=2, n_next=2, batch_size=width,
                      n_unrolling_steps=1, use_social=True, use_pallas=True)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(9)

    dp_state, dp_m = make_dp_train_step(cfg, mesh)(state, batch, rng)
    sd_state, sd_m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)
    np.testing.assert_allclose(float(dp_m.g_loss), float(sd_m.g_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(dp_m.d_loss), float(sd_m.d_loss),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.g_params, sd_state.g_params)

    # same mesh step through the XLA social path: kernel-tolerance parity
    cfg_x = cfg.replace(use_pallas=False)
    xla_state, xla_m = make_dp_train_step(cfg_x, mesh)(state, batch, rng)
    np.testing.assert_allclose(float(dp_m.g_loss), float(xla_m.g_loss),
                               rtol=1e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        dp_state.g_params, xla_state.g_params)


def test_dp_step_mb_std_matches_single_device(mesh):
    """--mb-std under DP: the minibatch-stddev moment sums are psum'd over
    the mesh axis, so every shard sees the GLOBAL statistic and the DP
    step still reproduces the single-device big-batch step exactly —
    including with padding (masked statistic)."""
    cfg = CFG.replace(n_unrolling_steps=1, mb_std=True)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _global_batch(8, key=13)
    valid = np.asarray(batch["valid"]).copy()
    valid[2 * 8 + 6: 2 * 8 + 8] = False
    ids = np.asarray(batch["scene_ids"]).copy()
    ids[2 * 8 + 6: 2 * 8 + 8] = -1
    batch["valid"] = jnp.asarray(valid)
    batch["scene_ids"] = jnp.asarray(ids)
    rng = jax.random.PRNGKey(21)

    step = make_dp_train_step(cfg, mesh)
    dp_state, dp_m = step(state, batch, rng)
    sd_state, sd_m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)

    np.testing.assert_allclose(float(dp_m.g_loss), float(sd_m.g_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(dp_m.d_loss), float(sd_m.d_loss),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.d_params, sd_state.d_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.g_params, sd_state.g_params)


@pytest.mark.parametrize("kw", [{"ms_weight": 0.1},
                                {"ds_weight": 0.5, "ds_tau": 100.0}])
def test_dp_step_mode_seeking_matches_single_device(mesh, kw):
    """--ms-weight / --ds-weight under DP: the global ratio's masked means
    are psum'd over the mesh axis (the per-sample hinge is row-local and
    composes with the standard valid-share grad weighting), and the second
    noise draw goes through the same global-draw-and-slice as the first —
    so the DP step reproduces the single-device big-batch step, including
    with padding (masked means)."""
    cfg = CFG.replace(n_unrolling_steps=1, **kw)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _global_batch(8, key=17)
    valid = np.asarray(batch["valid"]).copy()
    valid[2 * 8 + 6: 2 * 8 + 8] = False
    ids = np.asarray(batch["scene_ids"]).copy()
    ids[2 * 8 + 6: 2 * 8 + 8] = -1
    batch["valid"] = jnp.asarray(valid)
    batch["scene_ids"] = jnp.asarray(ids)
    rng = jax.random.PRNGKey(23)

    step = make_dp_train_step(cfg, mesh)
    dp_state, dp_m = step(state, batch, rng)
    sd_state, sd_m = jax.jit(lambda s, b, r: gan_step(s, b, r, cfg))(
        state, batch, rng)

    np.testing.assert_allclose(float(dp_m.g_loss), float(sd_m.g_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(dp_m.d_loss), float(sd_m.d_loss),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.d_params, sd_state.d_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        dp_state.g_params, sd_state.g_params)
