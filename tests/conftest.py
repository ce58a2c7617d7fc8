"""Test env: force CPU backend with 8 fake devices BEFORE jax initializes.

Mirrors SURVEY.md §4 item 4: distributed tests run on a virtual device mesh
(`--xla_force_host_platform_device_count=8`) so pjit/psum paths are exercised
without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism / speed for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# Parity tests compare against torch f32; keep full f32 accumulation in
# matmuls/convs (the backend default may use lower-precision passes).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
