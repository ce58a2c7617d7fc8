"""Driver-artifact contract tests.

``dryrun_multichip`` must be hermetic: the driver runs it in an environment
whose *default* JAX platform is a single tunneled TPU (whose libtpu can
mismatch the client), with fake CPU devices available only via
``--xla_force_host_platform_device_count``.  Round 1 failed exactly here
(MULTICHIP_r01.json ok=false): eager ops hit the default platform before the
CPU mesh was built.  These tests run the dryrun in a SUBPROCESS with the
conftest CPU pin stripped, so the sitecustomize default platform (axon/TPU
when tunneled) is live — simulating the driver environment for real.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_like_env(n_devices: int = 8):
    env = dict(os.environ)
    # conftest.py pins JAX_PLATFORMS=cpu for in-process tests; the driver
    # does NOT — strip the pin so the subprocess sees the real default
    # platform (axon TPU under the tunnel, cpu elsewhere).
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


@pytest.mark.slow
def test_dryrun_multichip_is_hermetic_under_driver_env():
    from tests.conftest import tpu_tunnel_alive

    if os.environ.get("PALLAS_AXON_POOL_IPS") and not tpu_tunnel_alive():
        pytest.skip("TPU tunnel relay down — axon-default subprocess would hang")
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
            cwd=REPO, env=_driver_like_env(8),
            capture_output=True, text=True, timeout=600,
        )
    except subprocess.TimeoutExpired as e:
        # The dryrun itself never touches the TPU, but a dead tunnel can
        # hang ANY axon-default-platform process at backend-registration
        # teardown. Distinguish that environment failure from a real
        # hermeticity bug: if the dryrun printed its OK line before the
        # hang, the contract held.
        out = (e.stdout or b"")
        out = out.decode() if isinstance(out, bytes) else out
        if "dryrun_multichip OK" in out:
            pytest.skip("dryrun OK but process hung at exit (tunnel down?)")
        raise
    assert proc.returncode == 0, (
        f"dryrun_multichip failed under driver env:\n{proc.stderr[-4000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout
    assert "mesh (4, 2)" in proc.stdout  # dp=4 x tp=2 over 8 devices


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    # conftest pins 8 fake CPU devices; the dryrun must also work when the
    # default platform IS cpu (the no-tunnel case).
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.compile() is not None
