"""Sample warping functions (reference: include/psdr/core/warp.h)."""

from __future__ import annotations

import jax.numpy as jnp

from .types import INV_PI, PI
from .math import safe_sqrt, squared_norm, safe_div


def square_to_uniform_disk_concentric(sample):
    """Shirley's low-distortion concentric square->disk map (warp.h:16-50)."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * PI * safe_div(rp, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * PI - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_cosine_hemisphere(sample):
    """Cosine-weighted hemisphere via concentric disk (warp.h:55-64)."""
    p = square_to_uniform_disk_concentric(sample)
    z = safe_sqrt(1.0 - squared_norm(p))
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    """cos(theta)/pi (warp.h:68-74)."""
    return INV_PI * v[..., 2]


def square_to_uniform_triangle(sample):
    """Square -> barycentric coordinates, uniform by area (warp.h:79-83)."""
    t = safe_sqrt(1.0 - sample[..., 0])
    return jnp.stack([1.0 - t, t * sample[..., 1]], axis=-1)


def square_to_uniform_triangle_pdf(_p):
    return 2.0
