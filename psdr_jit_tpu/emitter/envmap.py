"""Lat-long environment map emitter (reference: src/emitter/envmap.cpp).

The scene adds an inward-facing bounding-box mesh whose emitter is the envmap
so paths terminate on geometry (scene.cpp:435-485); position sampling picks a
direction from the luminance*sin(theta) table and intersects the scene AABB
(envmap.cpp:87-114).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.types import pytree, static_field, mutable_pytree, PI, INV_PI, INV_TWO_PI, TWO_PI, EPSILON
from ..core.bitmap import Bitmap
from ..core.distribution import HyperCubeDistribution
from ..core.records import PositionSample
from ..core.math import (
    rgb2luminance, normalize, squared_norm, safe_sqrt, safe_rsqrt,
    ray_intersect_scene_aabb, dot, safe_div,
)
from ..core.types import Ray
from ..core import transform as xf
from .emitter import Emitter


@mutable_pytree(leaves=("radiance", "scale", "to_world_raw", "to_world_left"))
class EnvironmentMap(Emitter):
    """User-facing environment map."""

    def __init__(self, radiance=None, scale=1.0):
        if radiance is None:
            radiance = Bitmap.from_value(jnp.ones(3), 3)
        elif isinstance(radiance, str):
            # reference EnvironmentMap(const char*) — load from image file
            from ..utils.image import read_image

            radiance = Bitmap.from_array(read_image(radiance)[..., :3])
        elif not isinstance(radiance, Bitmap):
            radiance = Bitmap.from_array(radiance)
        self.radiance = radiance
        self.scale = jnp.float32(scale)
        self.to_world_raw = jnp.eye(4, dtype=jnp.float32)
        self.to_world_left = jnp.eye(4, dtype=jnp.float32)
        self.mesh_index = -1  # bounding mesh, assigned at configure
        self.id = ""

    def set_transform(self, m):
        self.to_world_left = jnp.asarray(m, jnp.float32)

    def to_string(self) -> str:
        return "EnvironmentMap[]"

    __repr__ = to_string


@pytree
class EnvironmentMapData:
    radiance: Bitmap
    scale: Any           # ()
    to_world: Any        # (4, 4)
    from_world: Any      # (4, 4)
    cell_distrb: HyperCubeDistribution
    lower: Any           # (3,) scene AABB
    upper: Any           # (3,)
    sampling_weight: Any # () normalized (scene sets = total weight pre-norm)
    mesh_index: int = static_field(default=-1)

    def eval(self, its, active):
        wi_world = its.sh_frame.to_world(its.wi)
        return self.eval_direction(-wi_world, active)

    def eval_direction(self, wi, active):
        """Radiance along world direction (envmap.cpp:57-73)."""
        v = xf.transform_dir(self.from_world, wi)
        u = jnp.arctan2(v[..., 0], -v[..., 2]) * INV_TWO_PI
        # clamp inside the poles: d(arccos)/dv is infinite at |v|=1 and
        # poisons orientation gradients with NaNs
        w = jnp.arccos(jnp.clip(v[..., 1], -1.0 + 1e-6, 1.0 - 1e-6)) * INV_PI
        uv = jnp.stack([u, w], axis=-1)
        uv = uv - jnp.floor(uv)
        val = self.radiance.eval(uv, flip_v=False, envmap_mode=True) * self.scale
        return jnp.where(active[..., None], val, 0.0)

    def sample_direction(self, uv, u_coin=None):
        """(detached) direction + pdf from the 2D cell table (envmap.cpp:117-132).

        ``u_coin``: the alias coin for big importance tables (see
        DiscreteDistribution.needs_coin) — required for an exact landing
        distribution at envmap cell counts."""
        uv, pdf = self.cell_distrb.sample_reuse(uv, u_coin)
        theta = uv[..., 1] * PI
        phi = uv[..., 0] * TWO_PI
        sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
        sin_p, cos_p = jnp.sin(phi), jnp.cos(phi)
        d = jnp.stack([cos_p * sin_t, sin_p * sin_t, cos_t], axis=-1)
        # (y, z, -x) axis shuffle (envmap.cpp:123)
        d = jnp.stack([d[..., 1], d[..., 2], -d[..., 0]], axis=-1)
        inv_sin_theta = safe_rsqrt(
            jnp.maximum(jnp.square(d[..., 0]) + jnp.square(d[..., 2]),
                        jnp.square(EPSILON))
        )
        pdf = jnp.where(pdf > EPSILON, pdf * inv_sin_theta * (0.5 / PI ** 2), pdf)
        d = xf.transform_dir(jax.lax.stop_gradient(self.to_world), d)
        return d, pdf

    def sample_position(self, ref_p, sample2, active,
                        u_coin=None) -> PositionSample:
        """Sample direction, then place the 'position' on the scene AABB
        (envmap.cpp:87-114)."""
        o = jax.lax.stop_gradient(ref_p)
        uv = jax.lax.stop_gradient(sample2)
        d, pdf = self.sample_direction(
            uv, None if u_coin is None else jax.lax.stop_gradient(u_coin))
        ray = Ray(o, d)
        t, n, g = ray_intersect_scene_aabb(
            ray, jax.lax.stop_gradient(self.lower),
            jax.lax.stop_gradient(self.upper),
        )
        return PositionSample(
            p=ray(t),
            n=n,
            pdf=pdf * g,
            J=jnp.ones(pdf.shape, jnp.float32),
            is_valid=active,
        )

    def sample_position_pdf(self, ref_p, its, active):
        """Back-projected pdf of a hit on the bounding mesh (envmap.cpp:142-162)."""
        d = jax.lax.stop_gradient(its.p) - jax.lax.stop_gradient(ref_p)
        dist2 = squared_norm(d)
        d = d * safe_rsqrt(dist2)[..., None]
        g = safe_div(jnp.abs(dot(d, jax.lax.stop_gradient(its.n))), dist2)
        d = xf.transform_dir(jax.lax.stop_gradient(self.from_world), d)
        factor = g * safe_rsqrt(
            jnp.maximum(jnp.square(d[..., 0]) + jnp.square(d[..., 2]),
                        jnp.square(EPSILON))
        ) * (0.5 / PI ** 2)
        u = jnp.arctan2(d[..., 0], -d[..., 2]) * INV_TWO_PI
        w = jnp.arccos(jnp.clip(d[..., 1], -1.0 + 1e-6, 1.0 - 1e-6)) * INV_PI
        uv = jnp.stack([u, w], axis=-1)
        uv = uv - jnp.floor(uv)
        ok = active & (its.mesh_id == self.mesh_index)
        # DEVIATION from the reference: envmap.cpp:142-162 omits the
        # emitter-SELECTION probability that area.cpp:48-59 includes, so in
        # a multi-emitter scene the reference's MIS weights fail to
        # partition unity on envmap paths (NEE's pdf carries the selection
        # factor, the BSDF-side pdf does not -> biased interior radiance).
        # We multiply by the normalized sampling_weight like AreaLight.
        return jnp.where(
            ok, self.cell_distrb.pdf(uv) * factor * self.sampling_weight, 0.0
        )


def build_envmap_distribution(radiance: Bitmap):
    """Importance table: luminance * sin(theta) on a 2(w-1) x 2(h-1) grid
    (envmap.cpp:17-41)."""
    w0, h0 = radiance.resolution
    # constant-radiance maps (the EnvironmentMap() default is a 1x1 bitmap)
    # get a minimal 2x2 grid: the luminance is uniform, so the importance
    # table reduces to sin(theta) weighting, which is exactly right
    width = max((w0 - 1) * 2, 2)
    height = max((h0 - 1) * 2, 2)
    # cells laid out row-major with x (=u) outermost like the reference's
    # HyperCubeDistribution<2> (dim 0 = x): cell index = x * height + y
    x = jnp.arange(width * height, dtype=jnp.int32) // height
    y = jnp.arange(width * height, dtype=jnp.int32) % height
    uv = jnp.stack(
        [(x.astype(jnp.float32) + 0.5) / width,
         (y.astype(jnp.float32) + 0.5) / height], axis=-1
    )
    val = jax.lax.stop_gradient(radiance.eval(uv, flip_v=False, envmap_mode=True))
    theta = (y.astype(jnp.float32) + 0.5) * (PI / height)
    mass = rgb2luminance(val) * jnp.sin(theta)
    return HyperCubeDistribution.init((width, height), mass)
