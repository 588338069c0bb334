"""Test config: run on a virtual 8-device CPU mesh so sharding tests work
without TPU hardware.

The environment's axon sitecustomize pins JAX_PLATFORMS=axon, so the env var
alone is not enough — we must override via jax.config before first backend
use.
"""

import os

if os.environ.get("PSDR_TPU_TESTS") == "1":
    # TPU-hardware smoke mode (tests/test_tpu_smoke.py, run ALONE): leave
    # the backend on axon/TPU so Mosaic lowering is exercised for real.
    import jax  # noqa: F401
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running optimization test")
