"""Megakernel Li (ops/megakernel.py) vs the general XLA path.

The megakernel hand-fuses the detached PathTracer Li (intersect + NEE +
MIS + cosine bounce) into one Pallas kernel with a sampler draw schedule
replicating ``core.sampler.Sampler`` exactly.  These tests run it through
the Pallas interpreter on CPU and require sample-for-sample agreement with
the XLA formulation up to visibility-epsilon flips: the kernel's secondary
ray origin is ``o + t*d`` while the path-space XLA reconstruction uses the
bilinear hit point — identical up to fp rounding, which can flip a grazing
shadow/hit test on a tiny fraction of lanes (measured ~0.08% relative L1
on the cbox).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import megakernel as mega
from psdr_jit_tpu.core.sampler import Sampler
from psdr_jit_tpu.integrator.base import interior_lane_setup
from scenes import make_cbox


@pytest.fixture
def cbox():
    sc = make_cbox(width=32, height=32, spp=4)
    sc.configure()
    return sc


def _camera_rays(sd, width, height, spp, seed):
    pix = jnp.arange(width * height, dtype=jnp.int32)
    m, sampler, samples = interior_lane_setup(
        width, height, spp, jnp.uint32(seed), pix
    )
    ray = sd.sensors[0].sample_primary_ray(samples, diff=False)
    return ray, sampler, jnp.ones((m * spp,), bool)


def test_applicable_static_checks(cbox):
    sd = jax.lax.stop_gradient(cbox.data)
    assert mega.applicable(sd)

    # textured diffuse disqualifies
    sc2 = make_cbox(width=8, height=8, spp=1)
    sc2.bsdfs[1].reflectance = psdr.Bitmap3fD(
        np.full((4, 4, 3), 0.5, np.float32))
    sc2.configure()
    assert not mega.applicable(sc2.data)

    # non-diffuse disqualifies
    sc3 = make_cbox(width=8, height=8, spp=1)
    sc3.bsdfs[1] = psdr.MicrofacetBSDF()
    sc3.configure()
    assert not mega.applicable(sc3.data)


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_li_matches_xla_path(cbox, depth):
    sd = jax.lax.stop_gradient(cbox.data)
    integ = psdr.PathTracer(depth)
    ray, sampler, active = _camera_rays(sd, 32, 32, 4, seed=5)

    old = mega.MEGA_MODE
    try:
        mega.MEGA_MODE = "off"
        s1 = Sampler(jnp.uint32(5), sampler.lane)
        s1.cnt = sampler.cnt
        li_ref = np.asarray(integ.Li(sd, s1, ray, active, diff=False))
        mega.MEGA_MODE = "interpret"
        s2 = Sampler(jnp.uint32(5), sampler.lane)
        s2.cnt = sampler.cnt
        li_mk = np.asarray(integ.Li(sd, s2, ray, active, diff=False))
        # draw schedules advanced identically
        assert s1.cnt == s2.cnt
    finally:
        mega.MEGA_MODE = old

    rel = np.abs(li_ref - li_mk).sum() / (np.abs(li_ref).sum() + 1e-9)
    assert rel < 5e-3, rel
    # image means are estimator-level equal
    np.testing.assert_allclose(li_mk.mean(), li_ref.mean(), rtol=2e-3)
    if depth == 0:
        # emitter-only: no secondary rays, so no epsilon flips — exact
        np.testing.assert_array_equal(li_ref, li_mk)


def test_renderc_uses_megakernel_consistently(cbox):
    """renderC through the megakernel equals the XLA render (few flipped
    visibility lanes aside) and the sampler schedule stays aligned."""
    old = mega.MEGA_MODE
    try:
        mega.MEGA_MODE = "off"
        img_ref = np.asarray(psdr.PathTracer(2).renderC(cbox, 0, seed=1))
        mega.MEGA_MODE = "interpret"
        img_mk = np.asarray(psdr.PathTracer(2).renderC(cbox, 0, seed=1))
    finally:
        mega.MEGA_MODE = old
    rel = np.abs(img_ref - img_mk).sum() / np.abs(img_ref).sum()
    assert rel < 5e-3, rel
    frac_diff = (np.abs(img_ref - img_mk).max(-1) > 1e-3).mean()
    assert frac_diff < 0.1, frac_diff


@pytest.mark.parametrize("depth", [0, 2])
def test_li_pair_matches_sequential(cbox, depth):
    """li_mega_pair (one paired launch) is BITWISE the subtraction of the
    two sequential li_mega calls it replaces: ray_n consumes cnt0..cnt0+2d-1
    and ray_p the next 2d draws, identical math order per side."""
    from psdr_jit_tpu.core.types import Ray
    from psdr_jit_tpu.core.math import normalize

    sd = jax.lax.stop_gradient(cbox.data)
    integ = psdr.PathTracer(depth)
    ray_n, sampler, active = _camera_rays(sd, 32, 32, 1, seed=9)
    # second ray set: nudged directions (stand-in for the edge's far side)
    ray_p = Ray(ray_n.o, normalize(ray_n.d + jnp.asarray([2e-3, 0.0, 0.0])))

    old = mega.MEGA_MODE
    try:
        mega.MEGA_MODE = "interpret"
        s1 = Sampler(jnp.uint32(9), sampler.lane)
        s1.cnt = sampler.cnt
        li_n = np.asarray(integ.Li(sd, s1, ray_n, active, diff=False))
        li_p = np.asarray(integ.Li(sd, s1, ray_p, active, diff=False))
        s2 = Sampler(jnp.uint32(9), sampler.lane)
        s2.cnt = sampler.cnt
        delta = np.asarray(integ.Li_pair(sd, s2, ray_n, ray_p, active))
        assert s1.cnt == s2.cnt  # pair advances two Li's worth of draws
    finally:
        mega.MEGA_MODE = old
    np.testing.assert_array_equal(delta, li_n - li_p)


def test_primary_edge_pass_through_megakernel():
    """The PE boundary estimator (two detached Li per lane — the megakernel's
    production use) keeps its analytic gradient: d(mean)/d(tx) = 0.5.

    Scene from test_grad_edges; depth 0 so the kernel is exercised inside
    renderD's jvp trace with detached inputs."""
    from test_grad_edges import _primary_edge_scene

    sc, light = _primary_edge_scene(x0=0.3, w=64, sppe=16)
    sc.configure()
    base = light.to_world_raw

    old = mega.MEGA_MODE
    try:
        mega.MEGA_MODE = "interpret"
        integ = psdr.PathTracer(0)

        def mean_img(tx, seed):
            light.to_world_raw = base.at[0, 3].add(tx)
            return jnp.mean(integ.renderD(sc, 0, seed=seed))

        grads = []
        for seed in range(4):
            _, d = jax.jvp(lambda t: mean_img(t, seed),
                           (jnp.float32(0.0),), (jnp.float32(1.0),))
            grads.append(float(d))
    finally:
        mega.MEGA_MODE = old
        light.to_world_raw = base
    np.testing.assert_allclose(np.mean(grads), 0.5, rtol=0.05)
