"""Test env: force CPU backend with 8 fake devices BEFORE jax initializes.

Mirrors SURVEY.md §4 item 4: distributed tests run on a virtual device mesh
(`--xla_force_host_platform_device_count=8`) so pjit/psum paths are exercised
without TPU hardware.
"""

import os

# The environment pins JAX_PLATFORMS=axon (tunneled TPU); override hard —
# tests must run on 8 fake CPU devices, never through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism / speed for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# CLI-in-process tests (golden pipeline) must not read/write the user's
# persistent XLA cache: entries AOT-compiled under different CPU features
# spam loader errors and risk SIGILL.
os.environ["VIPERS_JAX_CACHE"] = "0"

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# sitecustomize (axon) pre-imports jax, so the env vars above can be too
# late; the config route works as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch f32; keep full f32 accumulation in
# matmuls/convs (the backend default may use lower-precision passes).
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.local_device_count() == 8, (
    f"tests need 8 fake CPU devices, got {jax.devices()}"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def tpu_tunnel_alive() -> bool:
    """True when the axon (tunneled TPU) relay is reachable.

    The TPU-subprocess tests strip the CPU pin, so a DEAD tunnel makes
    their child processes hang at backend init until the 600s timeout.
    This 1s TCP probe of the relay's compile endpoint lets them skip
    immediately instead. No axon env at all -> False (plain no-TPU host).
    """
    pool = os.environ.get("PALLAS_AXON_POOL_IPS")
    if not pool:
        return False
    import socket

    # probe the first pool host (the env var lists bare IPs; the relay's
    # compile endpoint sits on the 8082-8117 port block)
    host = pool.split(",")[0].strip()
    try:
        with socket.create_connection((host, 8083), timeout=1):
            return True
    except OSError:
        return False
