"""Rough dielectric (GGX reflection + refraction)
(reference: src/bsdf/roughdielectric.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import mutable_pytree
from ..core.records import BSDFSample
from ..core.math import normalize, mulsign, safe_div, fresnel_dielectric
from .bsdf import BSDF
from .ggx import GGXDistribution
from .microfacet import _as_bitmap


@mutable_pytree(
    leaves=("alpha_u", "alpha_v", "eta_value"),
    static=("twoSide",),
)
class RoughDielectricBSDF(BSDF):
    def __init__(self, alpha_u=0.1, alpha_v=None, int_ior=1.5, ext_ior=1.0,
                 twoSide: bool = False):
        self.alpha_u = _as_bitmap(alpha_u, 1)
        self.alpha_v = _as_bitmap(alpha_u if alpha_v is None else alpha_v, 1)
        self.eta_value = jnp.float32(int_ior / ext_ior)
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
        active = active & (cos_i != 0.0)
        reflect = cos_i * cos_o > 0.0

        m_eta = self.eta_value
        m_inv_eta = 1.0 / m_eta
        eta = jnp.where(cos_i > 0.0, m_eta, m_inv_eta)
        inv_eta = jnp.where(cos_i > 0.0, m_inv_eta, m_eta)

        m = normalize(wi + wo * jnp.where(reflect, 1.0, eta)[..., None])
        m = mulsign(m, m[..., 2:3])

        distr = self._distr(its.uv)
        d = distr.eval(m)
        wi_dot_m = jnp.sum(wi * m, axis=-1)
        f = fresnel_dielectric(m_eta, wi_dot_m)[0]
        g = distr.G(wi, wo, m)

        value_r = safe_div(f * d * g, 4.0 * jnp.abs(cos_i))
        scale = jnp.square(inv_eta)
        wo_dot_m = jnp.sum(wo * m, axis=-1)
        value_t = jnp.abs(
            safe_div(
                scale * (1.0 - f) * d * g * eta * eta * wi_dot_m * wo_dot_m,
                cos_i * jnp.square(wi_dot_m + eta * wo_dot_m),
            )
        )
        result = jnp.where(reflect & active, value_r, 0.0) + jnp.where(
            (~reflect) & active, value_t, 0.0
        )
        return jnp.broadcast_to(result[..., None], result.shape + (3,))

    def sample(self, its, rnd3, active) -> BSDFSample:
        wi = its.wi
        if self.twoSide:
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))
        cos_i = wi[..., 2]
        active = active & (cos_i != 0.0)
        distr = self._distr(its.uv)
        m, pdf = distr.sample(mulsign(wi, cos_i[..., None]), rnd3)
        active = active & (pdf != 0.0)

        eta = self.eta_value
        wi_dot_m = jnp.sum(wi * m, axis=-1)
        f, cos_theta_t, eta_it, eta_ti = fresnel_dielectric(eta, wi_dot_m)

        selected_r = (rnd3[..., 2] <= f) & active
        pdf = pdf * jnp.where(selected_r, f, 1.0 - f)
        bs_eta = jnp.where(selected_r, 1.0, eta_it)

        wo_r = 2.0 * wi_dot_m[..., None] * m - wi
        wo_t = (
            m * (wi_dot_m * eta_ti + cos_theta_t)[..., None]
            - wi * eta_ti[..., None]
        )
        wo = jnp.where(selected_r[..., None], wo_r, wo_t)
        wo_dot_m = jnp.sum(wo * m, axis=-1)
        dwh_dwo = jnp.where(
            selected_r,
            safe_div(1.0, 4.0 * wo_dot_m),
            safe_div(
                jnp.square(bs_eta) * wo_dot_m,
                jnp.square(wi_dot_m + bs_eta * wo_dot_m),
            ),
        )
        # pdf(wo) = D_vis(m) * lobe_prob * |dm/dwo|.  NOTE: the reference
        # (roughdielectric.cpp:~240) multiplies an extra smith_g1(wo, m) here
        # while its __pdf omits the |wi.m| of the visible-NDF density — the
        # two disagree and neither is the true sample density, which biases
        # the estimator.  We use the exact density on both paths instead.
        pdf = pdf * jnp.abs(dwh_dwo)
        bs = BSDFSample(
            wo=wo, pdf=pdf, eta=bs_eta, is_valid=active
        )
        return jax.lax.stop_gradient(bs)

    def pdf(self, its, wo, active):
        wi, wo = self._orient(its.wi, wo)
        cos_i, cos_o = wi[..., 2], wo[..., 2]
        active = active & (cos_i != 0.0)
        reflect = cos_i * cos_o > 0.0
        m_eta = self.eta_value
        eta = jnp.where(cos_i > 0.0, m_eta, 1.0 / m_eta)
        m = normalize(wi + wo * jnp.where(reflect, 1.0, eta)[..., None])
        m = mulsign(m, m[..., 2:3])
        wi_dot_m = jnp.sum(wi * m, axis=-1)
        wo_dot_m = jnp.sum(wo * m, axis=-1)
        active = active & (wi_dot_m * cos_i > 0.0) & (wo_dot_m * cos_o > 0.0)
        dwh_dwo = jnp.where(
            reflect,
            safe_div(1.0, 4.0 * wo_dot_m),
            safe_div(eta * eta * wo_dot_m, jnp.square(wi_dot_m + eta * wo_dot_m)),
        )
        distr = self._distr(its.uv)
        pwi = mulsign(wi, cos_i[..., None])
        # visible-NDF density of m (includes |wi.m|; see note in sample()):
        prob = safe_div(
            distr.eval(m) * distr.smith_g1(pwi, m) * jnp.abs(wi_dot_m),
            pwi[..., 2],
        )
        f = fresnel_dielectric(m_eta, wi_dot_m)[0]
        prob = prob * jnp.where(reflect, f, 1.0 - f)
        return jax.lax.stop_gradient(
            jnp.where(active, prob * jnp.abs(dwh_dwo), 0.0)
        )
