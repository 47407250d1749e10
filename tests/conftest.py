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
