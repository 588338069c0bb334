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

# Pin the remat mode BEFORE the first bench import: bench.py setdefaults
# PSDR_REMAT=prb, and the prb custom_vjp breaks the jax.jvp used by the
# forward-mode gradient oracles below (found on the first hardware run).
os.environ.setdefault("PSDR_REMAT", "chunk")

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


# ---------------------------------------------------------------------------
# Gradient-correctness oracles ON HARDWARE (VERDICT r4 next #5): the
# analytic edge oracles and an FD-vs-AD interior check previously ran only
# on the CPU suite — which is exactly how the TPU-only excess-precision
# elision bug (ops/gather.py) survived two rounds undetected.  Delegating
# to the CPU-suite test bodies keeps one definition of each contract.
# ---------------------------------------------------------------------------

def test_primary_edge_oracle_on_hardware():
    """PE boundary gradient == exactly 0.5 (screen-coverage derivative),
    evaluated on the real TPU (test_grad_edges analytic oracle)."""
    import test_grad_edges as ge

    ge.test_primary_edge_gradient_analytic()


def test_secondary_edge_oracle_on_hardware():
    """SE boundary gradient == closed-form shadow derivative on the real
    TPU (test_grad_edges analytic oracle)."""
    import test_grad_edges as ge

    ge.test_secondary_edge_gradient_analytic()


def test_interior_fd_vs_ad_on_hardware():
    """Fixed-seed finite differences vs AD for a smooth (albedo)
    parameter on the real TPU (SURVEY §4 FD-vs-AD mitigation, on the
    device that matters)."""
    import test_grad_interior as gi
    from scenes import make_cbox

    sc = make_cbox(width=16, height=16, spp=4)
    sc.configure()
    gi.test_albedo_gradient_fd(sc)


def test_cross_backend_oracle_on_hardware():
    """The bench cross-backend gradient oracle as a test: TPU loss+grads
    vs the CPU-subprocess reference on the identical sample set."""
    import subprocess
    import tempfile

    import crosscheck

    path = os.path.join(tempfile.mkdtemp(prefix="psdr_oracle_"), "cpu.npz")
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "crosscheck.py")
    env = dict(os.environ)
    env.pop("PSDR_TPU_TESTS", None)  # subprocess conftest must stay CPU
    proc = subprocess.Popen([sys.executable, script, "--cpu", path],
                            env=env)
    tpu_res = crosscheck.compute()
    assert proc.wait(timeout=1200) == 0
    rel = crosscheck.compare(crosscheck.load(path), tpu_res)
    # calibrated gates: see bench._oracle_gate / scripts/oracle_validate.py
    assert rel["finite"] and rel["loss"] < 5e-3 and rel["img"] < 1e-2 \
        and rel["grad"] < 0.05, rel
