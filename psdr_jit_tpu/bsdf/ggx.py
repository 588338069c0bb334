"""GGX microfacet distribution with visible-normal sampling
(reference: src/bsdf/ggx.cpp)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import PI
from ..core.math import safe_sqrt, safe_div, squared_norm, normalize, lerp
from ..core import warp
from ..core.types import sin_phi as _sin_phi, cos_phi as _cos_phi


class GGXDistribution:
    """Anisotropic GGX; ``alpha_u/alpha_v`` may be per-lane arrays."""

    def __init__(self, alpha_u, alpha_v=None):
        self.alpha_u = alpha_u
        self.alpha_v = alpha_u if alpha_v is None else alpha_v

    def eval(self, m):
        """NDF D(m) (ggx.cpp:13-32)."""
        alpha_uv = self.alpha_u * self.alpha_v
        cos_theta = m[..., 2]
        inner = (
            jnp.square(safe_div(m[..., 0], self.alpha_u))
            + jnp.square(safe_div(m[..., 1], self.alpha_v))
            + jnp.square(m[..., 2])
        )
        result = safe_div(1.0, PI * alpha_uv * jnp.square(inner))
        return jnp.where(result * cos_theta > 1e-20, result, 0.0)

    def smith_g1(self, v, m):
        """Smith masking G1 (ggx.cpp:84-99)."""
        xy_alpha_2 = jnp.square(self.alpha_u * v[..., 0]) + jnp.square(
            self.alpha_v * v[..., 1]
        )
        tan_theta_alpha_2 = safe_div(xy_alpha_2, jnp.square(v[..., 2]))
        result = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
        result = jnp.where(xy_alpha_2 == 0.0, 1.0, result)
        result = jnp.where(
            jnp.sum(v * m, axis=-1) * v[..., 2] <= 0.0, 0.0, result
        )
        return result

    def G(self, wi, wo, m):
        return self.smith_g1(wi, m) * self.smith_g1(wo, m)

    def sample_visible_11(self, cos_theta_i, sample2):
        """Visible-NDF sampling in the alpha=1 frame (ggx.cpp:101-112)."""
        p = warp.square_to_uniform_disk_concentric(sample2)
        s = 0.5 * (1.0 + cos_theta_i)
        py = lerp(safe_sqrt(1.0 - jnp.square(p[..., 0])), p[..., 1], s)
        x = p[..., 0]
        y = py
        z = safe_sqrt(1.0 - (jnp.square(x) + jnp.square(y)))
        sin_theta_i = safe_sqrt(1.0 - jnp.square(cos_theta_i))
        norm_ = safe_div(1.0, sin_theta_i * y + cos_theta_i * z)
        return jnp.stack(
            [(cos_theta_i * y - sin_theta_i * z) * norm_, x * norm_], axis=-1
        )

    def sample(self, wi, sample3):
        """Sample a visible normal; returns (m, detached pdf) (ggx.cpp:35-80)."""
        wi_p = normalize(
            jnp.stack(
                [
                    self.alpha_u * wi[..., 0],
                    self.alpha_v * wi[..., 1],
                    wi[..., 2],
                ],
                axis=-1,
            )
        )
        sin_phi = _sin_phi(wi_p)
        cos_phi = _cos_phi(wi_p)
        cos_theta = wi_p[..., 2]
        slope = self.sample_visible_11(cos_theta, sample3[..., :2])
        slope = jnp.stack(
            [
                (cos_phi * slope[..., 0] - sin_phi * slope[..., 1]) * self.alpha_u,
                (sin_phi * slope[..., 0] + cos_phi * slope[..., 1]) * self.alpha_v,
            ],
            axis=-1,
        )
        m = normalize(
            jnp.stack(
                [-slope[..., 0], -slope[..., 1], jnp.ones_like(slope[..., 0])],
                axis=-1,
            )
        )
        import jax

        pdf = (
            self.smith_g1(wi, m)
            * jnp.abs(jnp.sum(wi * m, axis=-1))
            * self.eval(m)
            * safe_div(1.0, jnp.abs(wi[..., 2]))
        )
        return m, jax.lax.stop_gradient(pdf)
