import os

# Force CPU with 8 virtual devices so multi-chip sharding tests run anywhere
# (standard JAX pattern; see SURVEY.md §4 item 3).
# Force override: the session environment may pin JAX_PLATFORMS to the real
# TPU (e.g. 'axon', whose plugin force-prepends itself to jax_platforms);
# tests must run on the virtual CPU mesh, so override via jax.config AFTER
# import — env vars alone are not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
