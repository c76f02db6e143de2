"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests exercise real collectives without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The image's sitecustomize registers a remote-TPU 'axon' backend in every
# interpreter and forces jax_platforms='axon,cpu' via jax.config (env vars
# are overridden); tests must run on the local 8-device CPU mesh, so force
# the config back BEFORE any backend is initialized.
jax.config.update("jax_platforms", "cpu")
# exact-f32 matmuls for oracle comparisons (prod keeps the fast default)
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
