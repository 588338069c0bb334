"""Microfacet BRDF: diffuse + GGX specular with Schlick-style Fresnel
(reference: src/bsdf/microfacet.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import INV_PI, mutable_pytree
from ..core.bitmap import Bitmap
from ..core.records import BSDFSample
from ..core.math import normalize, mulsign, safe_div
from .bsdf import BSDF
from .ggx import GGXDistribution


def _as_bitmap(value, channels):
    if isinstance(value, Bitmap):
        return value
    import numpy as np

    arr = np.asarray(value, np.float32)
    if arr.ndim >= 3:
        return Bitmap.from_array(arr)
    return Bitmap.from_value(arr, channels)


@mutable_pytree(
    leaves=("specularReflectance", "diffuseReflectance", "roughness"),
    static=("twoSide",),
)
class MicrofacetBSDF(BSDF):
    def __init__(self, specular=(0.04, 0.04, 0.04), diffuse=(0.5, 0.5, 0.5),
                 roughness=0.5, twoSide: bool = False):
        self.specularReflectance = _as_bitmap(specular, 3)
        self.diffuseReflectance = _as_bitmap(diffuse, 3)
        self.roughness = _as_bitmap(roughness, 1)
        self.twoSide = twoSide

    def _orient(self, wi, wo):
        if self.twoSide:
            wo = wo.at[..., 2].set(mulsign(wo[..., 2], wi[..., 2]))
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))
        return wi, wo

    def eval(self, its, wo, active):
        wi, wo = self._orient(its.wi, wo)
        cos_nv = wi[..., 2]
        cos_nl = wo[..., 2]
        active = active & (cos_nv > 0.0) & (cos_nl > 0.0)

        diffuse = self.diffuseReflectance.eval(its.uv) * INV_PI
        h = normalize(wi + wo)
        cos_vh = jnp.sum(h * wi, axis=-1)
        f0 = self.specularReflectance.eval(its.uv)
        alpha = jnp.square(self.roughness.eval1(its.uv))
        distr = GGXDistribution(alpha)
        ggx = distr.eval(h)
        # UE4-style Schlick with spherical-gaussian power (microfacet.cpp:53-55)
        coeff = cos_vh * (-5.55473 * cos_vh - 6.8316)
        fresnel = f0 + (1.0 - f0) * jnp.exp2(coeff)[..., None]
        smith_g = distr.smith_g1(wi, h) * distr.smith_g1(wo, h)
        numerator = (ggx * smith_g)[..., None] * fresnel
        denominator = 4.0 * cos_nl * cos_nv
        specular = numerator / (denominator + 1e-6)[..., None]
        value = (diffuse + specular) * cos_nl[..., None]
        return jnp.where(active[..., None], value, 0.0)

    def sample(self, its, rnd3, active) -> BSDFSample:
        wi = its.wi
        if self.twoSide:
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))
        cos_i = wi[..., 2]
        alpha = jnp.square(self.roughness.eval1(its.uv))
        distr = GGXDistribution(alpha)
        m, m_pdf = distr.sample(wi, rnd3)
        wo = 2.0 * jnp.sum(wi * m, axis=-1, keepdims=True) * m - wi
        pdf = safe_div(m_pdf, 4.0 * jnp.sum(wo * m, axis=-1))
        bs = BSDFSample(
            wo=wo,
            pdf=pdf,
            eta=jnp.ones(pdf.shape, jnp.float32),
            is_valid=active & (cos_i > 0.0) & (pdf != 0.0) & (wo[..., 2] > 0.0),
        )
        return jax.lax.stop_gradient(bs)

    def pdf(self, its, wo, active):
        wi, wo = self._orient(its.wi, wo)
        cos_i = wi[..., 2]
        cos_o = wo[..., 2]
        m = normalize(wo + wi)
        active = (
            active
            & (cos_i > 0.0)
            & (cos_o > 0.0)
            & (jnp.sum(wi * m, axis=-1) > 0.0)
            & (jnp.sum(wo * m, axis=-1) > 0.0)
        )
        alpha = jnp.square(self.roughness.eval1(its.uv))
        distr = GGXDistribution(alpha)
        result = safe_div(distr.eval(m) * distr.smith_g1(wi, m), 4.0 * cos_i)
        return jax.lax.stop_gradient(jnp.where(active, result, 0.0))
