"""Equivalence of the batched edge-pass formulations.

The PE pass can evaluate its detached Li(ray_n)/Li(ray_p) pair as one
double-width batch, and the SE pass can run its two independent detached
intersections (p0 -> emitter, p0 -> receiver) as one double-width call
(integrator/base.py pe_stack_enabled routing — default ON for BVH scenes,
OFF for small scenes).  Batching must not change the estimator:

* SE: the math is identical lane-for-lane; only XLA fusion tiling changes
  with batch width, which shifts gathered hit attributes by ULPs and can
  flip a grazing-lane visibility tie on a tiny fraction of lanes (the same
  documented effect as the megakernel parity gate, bench.py).  Assert
  image-level agreement with a loose relative bound and a small
  differing-pixel fraction.
* PE: the stacked path deliberately uses common random numbers across the
  pair (variance reduction; expectation unchanged), so only statistical
  agreement holds — covered by the cross-path consistency tests elsewhere;
  here we just check finiteness and scale.

Mirrors reference behavior: the reference evaluates both PE rays inside
one fused drjit kernel (integrator.cpp:185-186) and runs its SE
intersections through one OptiX launch queue (scene_optix.cpp:358-375).
"""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from psdr_jit_tpu.integrator import base as ibase
from scenes import make_cbox


@pytest.fixture(autouse=True)
def _restore_stack_knob():
    prev = (ibase._PE_STACK, ibase._SE_PAIR)
    yield
    ibase._PE_STACK, ibase._SE_PAIR = prev


def _se_grad_image(sc, integ, mesh0, pair, seed):
    ibase._SE_PAIR = pair

    def f(p):
        mesh0.set_transform(jnp.eye(4).at[0, 3].set(p * 100.0))
        sd = sc.configure_data([0])
        return integ.render_secondary_edges(sd, sc.opts, 0, jnp.uint32(seed))

    _, d = jax.jvp(f, (jnp.float32(0.0),), (jnp.float32(1.0),))
    return np.asarray(d)


def test_se_pair_matches_sequential():
    sc = make_cbox(width=32, height=32, spp=0, sppe=0, sppse=8)
    sc.configure()
    integ = psdr.PathTracer(1)
    mesh0 = sc.param_map["Mesh[0]"]

    for seed in (3, 11):
        a = _se_grad_image(sc, integ, mesh0, False, seed)
        b = _se_grad_image(sc, integ, mesh0, True, seed)
        assert np.isfinite(b).all()
        rel = np.abs(a - b).sum() / (np.abs(a).sum() + 1e-12)
        frac = (np.abs(a - b) > 1e-7).mean()
        # ULP-level fusion-tiling shifts flip at most a handful of grazing
        # visibility ties (measured: rel 8.4e-4 / 2.6e-7, frac <= 0.4%)
        assert rel < 5e-3, (seed, rel)
        assert frac < 0.02, (seed, frac)


def test_pe_stack_finite_and_scaled():
    sc = make_cbox(width=32, height=32, spp=0, sppe=8, sppse=0)
    sc.configure()
    integ = psdr.PathTracer(1)
    mesh0 = sc.param_map["Mesh[0]"]

    def pe_grad(stack, seed):
        ibase._PE_STACK = stack

        def f(p):
            mesh0.set_transform(jnp.eye(4).at[0, 3].set(p * 100.0))
            sd = sc.configure_data([0])
            return integ._render_primary_edges(sd, sc.opts, 0,
                                               jnp.uint32(seed))

        _, d = jax.jvp(f, (jnp.float32(0.0),), (jnp.float32(1.0),))
        return np.asarray(d)

    a = pe_grad(False, 5)
    b = pe_grad(True, 5)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # common-random-numbers stacking changes per-seed values, not the
    # estimator: totals agree to MC accuracy at these sample counts
    assert abs(a.sum() - b.sum()) < 0.5 * max(1.0, abs(a.sum())), (
        a.sum(), b.sum())


def test_se_liveness_sort_matches_default():
    """PSDR_SE_SORT=1 (liveness-sorted SE lanes + dense-path parking —
    perf-refuted on the headline, scripts/rrows_ab.py, but the knob stays
    for future workload classes) computes the SAME estimator: per-lane
    draws are pure functions of the lane id, so sorting only permutes
    scatter order (TPU A/B measured losses bitwise-identical)."""
    from psdr_jit_tpu.ops import intersect_pallas as ip

    sc = make_cbox(width=32, height=32, spp=0, sppe=0, sppse=8)
    sc.configure()
    integ = psdr.PathTracer(1)
    mesh0 = sc.param_map["Mesh[0]"]

    prev = (ibase._SE_SORT, ip.DENSE_PARK)
    try:
        ibase._SE_SORT = False
        a = _se_grad_image(sc, integ, mesh0, False, seed=7)
        ibase._SE_SORT = True
        ip.DENSE_PARK = True
        # DENSE_PARK is read inside the module-level ray_intersect_pallas
        # jit: clear it so the parking branch actually re-traces
        ip.ray_intersect_pallas.clear_cache()
        b = _se_grad_image(sc, integ, mesh0, False, seed=7)
    finally:
        ibase._SE_SORT, ip.DENSE_PARK = prev
        ip.ray_intersect_pallas.clear_cache()
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)
