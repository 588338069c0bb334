"""Textured Lambertian BSDF (reference: src/bsdf/diffuse.cpp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import INV_PI, mutable_pytree
from ..core.bitmap import Bitmap
from ..core.records import BSDFSample
from ..core import warp
from ..core.math import mulsign
from .bsdf import BSDF


@mutable_pytree(leaves=("reflectance",), static=("twoSide",))
class DiffuseBSDF(BSDF):
    """Lambertian with a (possibly textured) differentiable reflectance."""

    def __init__(self, reflectance=(0.5, 0.5, 0.5), twoSide: bool = False):
        if isinstance(reflectance, Bitmap):
            self.reflectance = reflectance
        elif isinstance(reflectance, str):
            # reference Diffuse(const char*) — texture from image file
            from ..core.bitmap import Bitmap3f

            self.reflectance = Bitmap3f(reflectance)
        else:
            import numpy as np

            arr = np.asarray(reflectance, np.float32)
            if arr.ndim >= 3:
                self.reflectance = Bitmap.from_array(arr)
            else:
                self.reflectance = Bitmap.from_value(arr, 3)
        self.twoSide = twoSide

    def _orient(self, wi, wo):
        if self.twoSide:
            # flip both into the upper hemisphere of wi (diffuse.cpp:28-31)
            wo = wo.at[..., 2].set(mulsign(wo[..., 2], wi[..., 2]))
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))
        return wi, wo

    def eval(self, its, wo, active):
        wi = its.wi
        wi, wo = self._orient(wi, wo)
        cos_i = wi[..., 2]
        cos_o = wo[..., 2]
        active = active & (cos_i > 0.0) & (cos_o > 0.0)
        value = self.reflectance.eval(its.uv) * (INV_PI * cos_o)[..., None]
        return jnp.where(active[..., None], value, 0.0)

    def sample(self, its, rnd3, active) -> BSDFSample:
        wi = its.wi
        if self.twoSide:
            wi = wi.at[..., 2].set(jnp.abs(wi[..., 2]))
        cos_i = wi[..., 2]
        wo = warp.square_to_cosine_hemisphere(rnd3[..., 1:3])
        pdf = warp.square_to_cosine_hemisphere_pdf(wo)
        bs = BSDFSample(
            wo=wo,
            pdf=pdf,
            eta=jnp.ones(pdf.shape, jnp.float32),
            is_valid=active & (cos_i > 0.0),
        )
        return jax.lax.stop_gradient(bs)

    def pdf(self, its, wo, active):
        wi = its.wi
        wi, wo = self._orient(wi, wo)
        cos_i = jax.lax.stop_gradient(wi[..., 2])
        cos_o = jax.lax.stop_gradient(wo[..., 2])
        active = active & (cos_i > 0.0) & (cos_o > 0.0)
        return jnp.where(active, INV_PI * cos_o, 0.0)

    def to_string(self) -> str:
        return f"DiffuseBSDF[reflectance={self.reflectance.resolution}]"
