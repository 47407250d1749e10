"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere, so this lives at the
top of conftest (the standard JAX pattern for testing pjit/shard_map without
TPU hardware).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored by the experimental 'axon' TPU plugin in
# this image; the config update is, as long as it runs before first backend
# use (it does — conftest imports precede all test imports).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toy_arrays():
    from socialways_tpu.data.toy import make_toy_npz_arrays
    return make_toy_npz_arrays(n_samples=3 * 6 * 12, n_conditions=6,
                               n_modes=3, n_per_batch=6, seed=30)


@pytest.fixture(scope="session")
def toy_npz(tmp_path_factory, toy_arrays):
    path = tmp_path_factory.mktemp("data") / "toy.npz"
    np.savez(path, **toy_arrays)
    return str(path)


# ---------------------------------------------------------------- markers
# Module-level markers: every test_parallel test exercises the 8-device
# mesh; every test_kernels test runs Pallas in interpret mode.  The slow
# set was measured from full --durations=0 runs (2026-08-18 and
# 2026-08-19, 1-core box): each listed test took >9 s there; `pytest -m
# "not slow"` is the <5-min iteration default, the full suite stays the
# CI/verify gate.  Round-4 additions: the heavy per-lever parity guards
# (mb_std/ms/ds/serial/unroll-ratio DP parity, crowd-sim sharding parity,
# kernel-vs-kernel A/Bs) — each protects a measured-negative or
# rarely-touched lever; the fast set keeps one representative of every
# feature axis (e.g. the af×social composition smoke subsumes the plain
# agent-frame isometry-invariance property).
_SLOW = {
    "test_auto_discovery_prepares_and_runs_loo",
    "test_gan_step_loss_invariant_under_isometry",
    "test_dp_step_mb_std_matches_single_device",
    "test_diversity_hinge_tau_gates_the_term",
    "test_social_composition_grad_accum_parity",
    "test_dp_step_mode_seeking_matches_single_device",
    "test_gan_step_mode_seeking_trains_and_pressures_diversity",
    "test_gan_step_mb_std_trains_and_shapes",
    "test_serial_rollout_matches_shared_vjp",
    "test_d_update_every_skips_d_phase",
    "test_chunked_pallas_matches_windowed_xla_fwd_and_grads",
    "test_ring_crowd_sim_equals_single_device",
    "test_sharded_crowd_sim_equals_single_device",
    "test_sharded_social_context_equals_single_device",
    "test_windowed_small_input_falls_back",
    "test_dp_step_agent_frame_social_matches_single_device",
    "test_info_weight_schedule",
    "test_crowd_simulate_agent_frame_equivariance",
    "test_bf16_eval_chunk_close_to_f32",
    "test_bf16_gan_step_keeps_f32_master_state",
    "test_bf16_gan_step_tracks_f32_dynamics",
    "test_bf16_grad_accum_matches_full_batch",
    "test_bf16_rollout_close_to_f32",
    "test_blockwise_social_context_gradients_match_dense",
    "test_categorical_gan_step_runs",
    "test_checkpoint_resume_continues_identically",
    "test_cli_anneal_horizon_counts_optimizer_steps",
    "test_cli_train_evaluate_round_trip",
    "test_cli_train_short_run_saves_final_checkpoint",
    "test_d_input_noise_perturbs_then_anneals_to_parity",
    "test_d_input_noise_with_grad_accum",
    "test_d_update_every_one_is_reference_parity",
    "test_dp_grads_match_single_device_bigbatch",
    "test_dp_instance_noise_matches_single_device",
    "test_dp_step_matches_single_device_bigbatch_exactly",
    "test_dp_step_matches_single_device_with_uneven_padding",
    "test_dp_step_on_grouped_toy",
    "test_dp_step_runs_and_replicates",
    "test_dp_step_with_grad_accum",
    "test_ensemble_members_match_solo_runs",
    "test_ensemble_mesh_matches_single_chip",
    "test_ensemble_mesh_rejects_indivisible_members",
    "test_fused_bf16_backward_uses_pallas_and_matches_f32_grads",
    "test_fused_fallback_backward_uses_windowed_when_bounded",
    "test_fused_gradients_via_xla_bwd",
    "test_fused_matches_xla_multi_scene",
    "test_gan_step_deterministic_under_fixed_key",
    "test_gan_step_fully_padded_chunk_is_noop",
    "test_gan_step_padding_invariance",
    "test_gan_step_updates_both_players",
    "test_gan_step_variety_and_l2",
    "test_gan_step_windowed_social_matches_dense",
    "test_generator_prepare_decode_equals_monolithic",
    "test_golden_retraining_reproduces",
    "test_grad_accum_matches_full_batch",
    "test_hierarchical_fused_epochs_matches_flat",
    "test_hierarchical_mesh_matches_flat_dp",
    "test_host_chunk_feed_matches_shard_packed",
    "test_lr_decay_off_by_default_matches_constant",
    "test_mesh_epoch_fn_matches_dp_step_loop",
    "test_mesh_trainer_end_to_end",
    "test_pac_classifier_scores_packs",
    "test_pac_grad_accum_composes",
    "test_pac_group_valid_drops_mixed_packs",
    "test_pallas_backward_matches_xla_grads",
    "test_pallas_dispatch_under_mesh",
    "test_r1_penalty_changes_d_updates_and_stays_finite",
    "test_remat_steps_is_value_identical",
    "test_rollout_matches_eager_reference_loop",
    "test_social_feature_grads_finite_despite_self_pairs",
    "test_spectral_norm_gan_step_runs_and_differs",
    "test_toy_training_improves",
    "test_trainer_epoch_on_device_matches_host_loop",
    "test_unroll_restore_modes",
    "test_windowed_social_context_matches_dense",
}


def pytest_collection_modifyitems(items):
    for item in items:
        fname = item.fspath.basename
        if fname == "test_parallel.py":
            item.add_marker(pytest.mark.mesh)
        if fname == "test_kernels.py":
            item.add_marker(pytest.mark.kernels)
        if item.originalname in _SLOW or item.name in _SLOW:
            item.add_marker(pytest.mark.slow)
