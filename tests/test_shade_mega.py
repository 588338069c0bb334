"""Attached interior-shading megakernel (ops/shade_mega.py) vs the XLA path.

The fused training step's interior term can route through a custom_vjp
Pallas pair whose backward derives the whole transpose via in-kernel
jax.vjp.  These tests run both kernels through the Pallas interpreter on
CPU and require the fused loss/gradients to match the general XLA
formulation at fp-reassociation level: the hit chain is sample-for-sample
identical on the cbox (no UV frames, bilinear secondary origins in the
stash kernel), so the only differences are reassociated float ops and the
occasional grazing visibility-epsilon flip (same contract as
tests/test_megakernel.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import megakernel as mega
from psdr_jit_tpu.ops import shade_mega
from scenes import make_cbox


def _fused_setup(depth, width=16, spp=4, sppe=0, sppse=0):
    sc = make_cbox(width=width, height=width, spp=spp)
    sc.opts.sppe = sppe
    sc.opts.sppse = sppse
    sc.configure()
    integ = psdr.PathTracer(depth)
    m0 = sc.meshes[0]
    base = jnp.asarray(m0.to_world_raw)
    target = jnp.zeros((width * width, 3), jnp.float32)

    def pixel_loss(rows, pix):
        return jnp.sum(jnp.square(rows - target[pix]), axis=-1)

    def apply_params(p):
        m0.to_world_raw = base.at[0, 3].add(p["tx"])
        sc.bsdfs[1].reflectance.data = jnp.broadcast_to(
            p["alb"], jnp.shape(sc.bsdfs[1].reflectance.data))
        sc.emitters[0].radiance = p["rad"]

    p0 = {
        "tx": jnp.float32(0.0),
        "alb": jnp.asarray(sc.bsdfs[1].reflectance.data).reshape(-1)[:3],
        "rad": jnp.asarray(sc.emitters[0].radiance),
    }
    return sc, integ, p0, apply_params, pixel_loss


def _run(sc, integ, p0, apply_params, pixel_loss, mode, seed=3):
    old = mega.MEGA_MODE
    mega.MEGA_MODE = mode
    try:
        loss, g, img = integ.loss_and_grad(
            sc, p0, apply_params, pixel_loss, seed=seed)
        return (float(loss), jax.tree_util.tree_map(np.asarray, g),
                np.asarray(img))
    finally:
        mega.MEGA_MODE = old


def test_applicable():
    sc = make_cbox(width=8, height=8, spp=1)
    sc.configure()
    assert shade_mega.applicable(jax.lax.stop_gradient(sc.data))
    sc2 = make_cbox(width=8, height=8, spp=1)
    sc2.bsdfs[1] = psdr.MicrofacetBSDF()
    sc2.configure()
    assert not shade_mega.applicable(jax.lax.stop_gradient(sc2.data))


@pytest.mark.parametrize("depth", [0, 1, 2, 3])
def test_fused_grad_matches_xla(depth):
    """Interior-only fused loss+grad: megakernel pair == XLA chain for
    vertex-translation, albedo and emitter-radiance gradients."""
    sc, integ, p0, apply_params, pixel_loss = _fused_setup(depth)
    l_ref, g_ref, img_ref = _run(sc, integ, p0, apply_params, pixel_loss,
                                 "off")
    l_mk, g_mk, img_mk = _run(sc, integ, p0, apply_params, pixel_loss,
                              "interpret")
    assert abs(l_ref - l_mk) / abs(l_ref) < 1e-4
    rel_img = np.abs(img_ref - img_mk).sum() / np.abs(img_ref).sum()
    assert rel_img < 1e-3, rel_img
    for k in g_ref:
        a, b = g_ref[k], g_mk[k]
        rel = np.abs(a - b).sum() / (np.abs(a).sum() + 1e-12)
        # fp reassociation + rare grazing-epsilon flips; depth>0 gradients
        # traverse the whole bounce chain
        assert rel < 5e-3, (k, rel)


def test_fused_grad_with_edge_terms():
    """Full fused step (interior megakernel + PE/SE edge estimators in one
    program) stays consistent with the all-XLA step."""
    sc, integ, p0, apply_params, pixel_loss = _fused_setup(
        2, width=16, spp=2, sppe=2, sppse=2)
    l_ref, g_ref, _ = _run(sc, integ, p0, apply_params, pixel_loss, "off")
    l_mk, g_mk, _ = _run(sc, integ, p0, apply_params, pixel_loss,
                         "interpret")
    assert abs(l_ref - l_mk) / abs(l_ref) < 1e-4
    for k in g_ref:
        a, b = g_ref[k], g_mk[k]
        rel = np.abs(a - b).sum() / (np.abs(a).sum() + 1e-12)
        assert rel < 5e-3, (k, rel)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs real Mosaic lowering (CI forces CPU); "
                           "bench.py's parity gate covers this on hardware")
def test_tpu_mosaic_compiles_depth3():
    """Compile (non-interpret) the shade kernel pair fwd+bwd at the shipped
    depth-3 config so Mosaic lowering regressions (e.g. the u32->f32 cast
    trap, CLAUDE.md) surface in a test run on hardware rather than at
    benchmark time."""
    sc, integ, p0, apply_params, pixel_loss = _fused_setup(3, width=16,
                                                           spp=2)
    l_mk, g_mk, _ = _run(sc, integ, p0, apply_params, pixel_loss, "auto")
    assert np.isfinite(l_mk)
    assert all(np.isfinite(g).all() for g in jax.tree_util.tree_leaves(g_mk))


def test_jvp_path_unaffected():
    """jax.jvp forward-mode renderD must keep the general XLA path (a
    custom_vjp primitive inside it would raise) — vjp_ok gating."""
    sc, integ, p0, apply_params, _ = _fused_setup(1, width=8, spp=1)
    old = mega.MEGA_MODE
    mega.MEGA_MODE = "interpret"
    try:
        m0 = sc.meshes[0]
        base = jnp.asarray(m0.to_world_raw)

        def mean_img(tx):
            m0.to_world_raw = base.at[0, 3].add(tx)
            return jnp.mean(integ.renderD(sc, 0, seed=1))

        _, d = jax.jvp(mean_img, (jnp.float32(0.0),), (jnp.float32(1.0),))
        assert np.isfinite(float(d))
    finally:
        mega.MEGA_MODE = old
        m0.to_world_raw = base
