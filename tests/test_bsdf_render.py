"""Render-level integration tests for every BSDF family.

Each material renders in a small closed scene: results must be finite,
non-black, energy-sane, and differentiable w.r.t. the material parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import psdr_jit_tpu as psdr
from scenes import make_cbox, _quads_to_mesh, SHORT_BLOCK


def _cbox_with(bsdf, max_depth=2):
    """Cornell box with the short block using the given BSDF."""
    sc = make_cbox(width=24, height=24, spp=8)
    sc.add_BSDF(bsdf, "test_mat")
    sc.meshes[-2].bsdf_id = len(sc.bsdfs) - 1  # short block
    sc.configure()
    img = np.asarray(psdr.PathTracer(max_depth).renderC(sc, 0, seed=0))
    return sc, img.reshape(24, 24, 3)


def test_microfacet_render():
    sc, img = _cbox_with(psdr.MicrofacetBSDF(
        specular=(0.2,) * 3, diffuse=(0.3, 0.25, 0.2), roughness=0.25))
    assert np.isfinite(img).all() and img.mean() > 0.05
    assert img.max() < 50.0


def test_roughconductor_render():
    sc, img = _cbox_with(psdr.RoughConductorBSDF(alpha_u=0.2))
    assert np.isfinite(img).all() and img.mean() > 0.05


def test_roughdielectric_render():
    sc, img = _cbox_with(psdr.RoughDielectricBSDF(alpha_u=0.2, int_ior=1.5),
                         max_depth=4)
    assert np.isfinite(img).all() and img.mean() > 0.05


def test_normalmap_render():
    # bumpy normal map over microfacet
    rng = np.random.default_rng(0)
    nm = rng.uniform(0.35, 0.65, (8, 8, 3)).astype(np.float32)
    nm[..., 2] = 1.0
    nested = psdr.MicrofacetBSDF(specular=(0.1,) * 3, diffuse=(0.4,) * 3,
                                 roughness=0.3)
    sc, img = _cbox_with(psdr.NormalMapBSDF(nm, nested))
    assert np.isfinite(img).all() and img.mean() > 0.05


def test_microfacet_pv_render_and_grad():
    """Per-vertex parameters interpolate at hits and carry gradients."""
    sc = make_cbox(width=16, height=16, spp=8)
    block = sc.meshes[-2]
    nv = block.num_vertices
    pv = psdr.MicrofacetBSDFPerVertex(
        np.full((nv, 3), 0.05, np.float32),
        np.tile(np.linspace(0.1, 0.9, nv)[:, None], (1, 3)).astype(np.float32),
        np.full((nv,), 0.4, np.float32),
    )
    sc.add_BSDF(pv, "pv")
    block.bsdf_id = len(sc.bsdfs) - 1
    sc.configure()
    integ = psdr.PathTracer(1)
    img = np.asarray(integ.renderC(sc, 0, seed=0))
    assert np.isfinite(img).all() and img.mean() > 0.01

    base = pv.diffuseReflectance

    def loss(d):
        pv.diffuseReflectance = base + d
        return jnp.mean(integ.renderD(sc, 0, seed=0))

    g = np.asarray(jax.grad(loss)(jnp.zeros_like(base)))
    pv.diffuseReflectance = base
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).any()
    # fixed-seed FD agreement (smooth parameter)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=g.shape), jnp.float32) * 0.01
    fd = (float(loss(v)) - float(loss(-v))) / 2.0
    np.testing.assert_allclose(float((g * np.asarray(v)).sum()), fd, rtol=5e-2)


def test_roughness_gradient():
    """Roughness (1-channel bitmap) gradients flow in renders."""
    sc = make_cbox(width=16, height=16, spp=8)
    mf = psdr.MicrofacetBSDF(specular=(0.3,) * 3, diffuse=(0.2,) * 3,
                             roughness=0.3)
    sc.add_BSDF(mf, "mf")
    sc.meshes[-2].bsdf_id = len(sc.bsdfs) - 1
    sc.configure()
    integ = psdr.PathTracer(1)
    base = mf.roughness.data

    def loss(s):
        mf.roughness.data = base * s
        return jnp.mean(integ.renderD(sc, 0, seed=0))

    g = float(jax.grad(loss)(jnp.float32(1.0)))
    eps = 1e-2
    fd = (float(loss(jnp.float32(1 + eps))) -
          float(loss(jnp.float32(1 - eps)))) / (2 * eps)
    mf.roughness.data = base
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=5e-2, atol=1e-6)


def test_field_object_filter():
    sc = make_cbox(width=16, height=16, spp=2)
    sc.meshes[-1].id = "tall_block"
    sc.configure()
    sil = np.asarray(
        psdr.FieldExtractionIntegrator("silhouette tall_block").renderC(sc, 0)
    ).reshape(16, 16, 3)
    sil_all = np.asarray(
        psdr.FieldExtractionIntegrator("silhouette").renderC(sc, 0)
    ).reshape(16, 16, 3)
    assert 0 < sil.mean() < 0.5 * sil_all.mean()
