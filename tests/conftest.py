"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (must run before jax initializes)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the TPU backend via jax config,
# overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    from vs_seg_tpu.data.synthetic import generate_dataset
    root = tmp_path_factory.mktemp("vsdata")
    generate_dataset(str(root), n_train=2, n_val=2, n_test=2, shape=(48, 48, 16))
    return str(root)
