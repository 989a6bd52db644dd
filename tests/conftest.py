"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (must run before jax initializes)."""

import os

import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in flags:
    # an inherited different count would break every sharding test with
    # confusing mesh-size errors — rewrite it rather than append a duplicate
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                   "--xla_force_host_platform_device_count=8", flags)
    os.environ["XLA_FLAGS"] = flags
else:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the TPU backend via jax config,
# overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, (
    f"expected the 8-virtual-device CPU mesh, got {len(jax.devices())}")

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
