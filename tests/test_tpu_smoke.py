"""TPU-hardware smoke: compile and run the Pallas megakernels NON-interpret.

The normal suite runs every Pallas kernel through the CPU interpreter
(tests/conftest.py forces CPU), so real Mosaic lowering of the detached-Li
megakernel and the attached shade megakernel's in-kernel ``jax.vjp`` is
otherwise exercised only by bench.py's parity gate at benchmark time
(advisor round-3 finding).  This file makes that gate runnable as a test:

    PSDR_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -x -q

With ``PSDR_TPU_TESTS=1`` the conftest leaves the backend alone (axon/TPU);
without it — i.e. in the normal CPU suite — every test here SKIPS.  Run this
file ALONE on hardware: the rest of the suite assumes the 8-device virtual
CPU mesh.

Mirrors the reference's only backend test, the OptiX smoke of
jit_optix_test.cpp:59-462 (compile + trace + compare on the real device).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

pytestmark = pytest.mark.skipif(
    os.environ.get("PSDR_TPU_TESTS") != "1"
    or jax.default_backend() != "tpu",
    reason="TPU hardware smoke; run alone with PSDR_TPU_TESTS=1 on TPU",
)


def test_megakernel_parity_non_interpret():
    """Both megakernels (detached Li + attached interior) compile via
    Mosaic and agree with the general XLA path on hardware.

    Delegates to bench.py's parity gate so the test and the benchmark
    guard the exact same contract; the gate raises AssertionError on
    catastrophic divergence (garbage/NaN/zero from a lowering change).
    """
    import bench

    res = bench._parity_gate()
    assert res["finite"]
