"""Normal-mapped wrapper BSDF with Schüssler-style two-facet shadowing
(reference: src/bsdf/normalmap.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import mutable_pytree, Frame
from ..core.records import BSDFSample
from ..core.math import normalize, mulsign, safe_div, dot
from .bsdf import BSDF
from .microfacet import _as_bitmap


def _wt(wp):
    """Tangent-facet direction (normalmap.cpp:20-23)."""
    return normalize(
        jnp.stack([-wp[..., 0], -wp[..., 1], jnp.zeros_like(wp[..., 0])], axis=-1)
    )


def _pdot(a, b):
    return jnp.maximum(0.0, dot(a, b))


def _sin_theta(v):
    return jnp.sqrt(jnp.maximum(v[..., 0] ** 2 + v[..., 1] ** 2, 0.0))


def _g1(wp, w):
    """Two-facet shadowing (normalmap.cpp:30-36)."""
    num = jnp.maximum(0.0, w[..., 2]) * jnp.maximum(0.0, wp[..., 2])
    den = _pdot(w, wp) + _pdot(w, _wt(wp)) * _sin_theta(wp)
    return jnp.minimum(1.0, safe_div(num, den))


def _lambda_p(wp, wi):
    """Projected-area fraction of the perturbed facet (normalmap.cpp:39-43)."""
    i_dot_p = _pdot(wp, wi)
    return safe_div(i_dot_p, i_dot_p + _pdot(_wt(wp), wi) * _sin_theta(wp))


def _p_frame(wp, dp_du):
    """Frame(n, s) constructor (frame.h:42-45).

    Falls back to an ONB from ``wp`` when the projected tangent degenerates
    (meshes without UVs have dp_du = 0; the reference would produce a
    zero frame there, normalmap.cpp:61).
    """
    n = wp
    proj = dp_du - wp * dot(wp, dp_du)[..., None]
    ok = (jnp.sum(proj * proj, axis=-1) > 1e-12)[..., None]
    fallback = Frame.from_normal(wp)
    s = jnp.where(ok, normalize(proj), fallback.s)
    t = normalize(jnp.cross(n, s))
    s = normalize(jnp.cross(t, n))
    return Frame(s=s, t=t, n=n)


@mutable_pytree(leaves=("nmap", "bsdf"), static=("twoSide",))
class NormalMapBSDF(BSDF):
    """Wraps a nested BSDF and perturbs its shading frame by a normal map."""

    def __init__(self, nmap, bsdf, twoSide: bool = False):
        self.nmap = _as_bitmap(nmap, 3)
        self.bsdf = bsdf
        self.twoSide = twoSide

    def _orient(self, wi, wo):
        if self.twoSide:
            wo = wo.at[..., 2].set(mulsign(wo[..., 2], wi[..., 2]))
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))
        return wi, wo

    def _setup(self, its):
        wp = normalize(self.nmap.eval(its.uv) * 2.0 - 1.0)
        frame = _p_frame(wp, its.dp_du)
        return wp, frame

    def eval(self, its, wo, active):
        wi, wo = self._orient(its.wi, wo)
        cos_i, cos_o = wi[..., 2], wo[..., 2]
        active = active & (cos_i > 0.0) & (cos_o > 0.0)

        wp, frame = self._setup(its)
        perturbed_its = its.replace(wi=frame.to_local(wi))
        perturbed_wo = frame.to_local(wo)

        shadowing = _g1(wp, wo)
        lam = _lambda_p(wp, wi)
        wt = _wt(wp)

        # i -> p -> o
        value = self.bsdf.eval(perturbed_its, perturbed_wo, active) * (
            lam * shadowing
        )[..., None]

        # i -> t -> p -> o
        wi_reflected = normalize(wi - 2.0 * dot(wi, wt)[..., None] * wt)
        refl_its = perturbed_its.replace(wi=frame.to_local(wi_reflected))
        extra = self.bsdf.eval(refl_its, perturbed_wo, active) * (
            (1.0 - lam) * shadowing
        )[..., None]
        value = value + jnp.where((dot(wi, wt) > 0.0)[..., None], extra, 0.0)
        return jnp.where(active[..., None], value, 0.0)

    def sample(self, its, rnd3, active) -> BSDFSample:
        wi = its.wi
        if self.twoSide:
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))

        wp, frame = self._setup(its)
        perturbed_its = its.replace(wi=frame.to_local(wi))
        lam = _lambda_p(wp, wi)
        wt = _wt(wp)
        itpo_mask = rnd3[..., 2] >= lam

        bs_direct = self.bsdf.sample(perturbed_its, rnd3, active & ~itpo_mask)
        wi_reflected = normalize(wi - 2.0 * dot(wi, wt)[..., None] * wt)
        refl_its = its.replace(wi=frame.to_local(wi_reflected))
        bs_itpo = self.bsdf.sample(refl_its, rnd3, active & itpo_mask)

        wo_local = jnp.where(itpo_mask[..., None], bs_itpo.wo, bs_direct.wo)
        pdf1 = self.bsdf.pdf(perturbed_its, wo_local, active)
        pdf2 = self.bsdf.pdf(refl_its, wo_local, active)
        pdf = lam * pdf1 + (1.0 - lam) * pdf2
        bs = BSDFSample(
            wo=frame.to_world(wo_local),
            pdf=pdf,
            eta=jnp.where(itpo_mask, bs_itpo.eta, bs_direct.eta),
            is_valid=active & (bs_direct.is_valid | bs_itpo.is_valid),
        )
        return jax.lax.stop_gradient(bs)

    def pdf(self, its, wo, active):
        wi, wo = self._orient(its.wi, wo)
        cos_i, cos_o = wi[..., 2], wo[..., 2]
        active = active & (cos_i > 0.0) & (cos_o > 0.0)
        wp, frame = self._setup(its)
        perturbed_wo = frame.to_local(wo)
        lam = _lambda_p(wp, wi)
        wt = _wt(wp)
        perturbed_its = its.replace(wi=frame.to_local(wi))
        wi_reflected = normalize(wi - 2.0 * dot(wi, wt)[..., None] * wt)
        refl_its = perturbed_its.replace(wi=frame.to_local(wi_reflected))
        value = lam * self.bsdf.pdf(perturbed_its, perturbed_wo, active) + (
            1.0 - lam
        ) * self.bsdf.pdf(refl_its, perturbed_wo, active)
        return jax.lax.stop_gradient(jnp.where(active, value, 0.0))
