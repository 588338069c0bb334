"""Anisotropic GGX conductor with complex-IOR Fresnel
(reference: src/bsdf/roughconductor.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import mutable_pytree
from ..core.records import BSDFSample
from ..core.math import normalize, mulsign, safe_div, fresnel_conductor
from .bsdf import BSDF
from .ggx import GGXDistribution
from .microfacet import _as_bitmap


@mutable_pytree(
    leaves=("alpha_u", "alpha_v", "eta", "k", "specular_reflectance"),
    static=("twoSide",),
)
class RoughConductorBSDF(BSDF):
    def __init__(self, alpha_u=0.1, alpha_v=None, eta=(0.2004, 0.9228, 1.102),
                 k=(3.913, 2.448, 2.1765), specular_reflectance=(1.0, 1.0, 1.0),
                 twoSide: bool = False):
        self.alpha_u = _as_bitmap(alpha_u, 1)
        self.alpha_v = _as_bitmap(alpha_u if alpha_v is None else alpha_v, 1)
        self.eta = _as_bitmap(eta, 3)
        self.k = _as_bitmap(k, 3)
        self.specular_reflectance = _as_bitmap(specular_reflectance, 3)
        self.twoSide = twoSide

    def anisotropic(self) -> bool:
        return True

    def _orient(self, wi, wo):
        if self.twoSide:
            wo = wo.at[..., 2].set(mulsign(wo[..., 2], wi[..., 2]))
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))
        return wi, wo

    def _distr(self, uv):
        return GGXDistribution(self.alpha_u.eval1(uv), self.alpha_v.eval1(uv))

    def eval(self, its, wo, active):
        wi, wo = self._orient(its.wi, wo)
        cos_i, cos_o = wi[..., 2], wo[..., 2]
        active = active & (cos_i > 0.0) & (cos_o > 0.0)
        distr = self._distr(its.uv)
        h = normalize(wo + wi)
        d = distr.eval(h)
        active = active & (d != 0.0)
        g = distr.G(wi, wo, h)
        result = safe_div(d * g, 4.0 * cos_i)
        f = fresnel_conductor(
            self.eta.eval(its.uv), self.k.eval(its.uv),
            jnp.sum(wi * h, axis=-1),
        )
        spec = self.specular_reflectance.eval(its.uv)
        value = f * result[..., None] * spec
        return jnp.where(active[..., None], value, 0.0)

    def sample(self, its, rnd3, active) -> BSDFSample:
        wi = its.wi
        if self.twoSide:
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))
        cos_i = wi[..., 2]
        distr = self._distr(its.uv)
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
        cos_i, cos_o = wi[..., 2], wo[..., 2]
        m = normalize(wo + wi)
        active = (
            active
            & (cos_i > 0.0)
            & (cos_o > 0.0)
            & (jnp.sum(wi * m, axis=-1) > 0.0)
            & (jnp.sum(wo * m, axis=-1) > 0.0)
        )
        distr = self._distr(its.uv)
        result = safe_div(distr.eval(m) * distr.smith_g1(wi, m), 4.0 * cos_i)
        return jax.lax.stop_gradient(jnp.where(active, result, 0.0))
