"""Area light attached to a mesh (reference: src/emitter/area.cpp)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.types import pytree, static_field, mutable_pytree
from ..core.math import rgb2luminance, safe_div
from ..core.records import PositionSample
from ..shape.mesh import MeshData, sample_position
from .emitter import Emitter


@mutable_pytree(leaves=("radiance",))
class AreaLight(Emitter):
    """User-facing: constant-radiance emitter bound to a mesh."""

    def __init__(self, radiance=(1.0, 1.0, 1.0)):
        self.radiance = jnp.asarray(radiance, jnp.float32).reshape(3)
        self.mesh_index = -1  # assigned by Scene.add_Mesh
        self.id = ""

    def to_string(self) -> str:
        return f"AreaLight[radiance={self.radiance}]"

    __repr__ = to_string


@pytree
class AreaLightData:
    """Configured emitter data (traced).

    ``sampling_weight`` is normalized by the scene (scene.cpp:489-515):
    raw weight = area * luminance (area.cpp:9-14), then divided by the sum
    over all emitters.
    """

    radiance: Any          # (3,)
    sampling_weight: Any   # () normalized
    mesh_data: MeshData    # shared reference to the emitter mesh's data
    mesh_index: int = static_field(default=-1)

    def eval(self, its, active):
        """One-sided constant radiance (area.cpp:17-26)."""
        ok = active & (its.wi[..., 2] > 0.0)
        return jnp.where(ok[..., None], self.radiance, 0.0)

    def sample_position(self, ref_p, sample2, active,
                        u_coin=None) -> PositionSample:
        # u_coin: unused (face tables are CDF-sampled); accepted so the
        # scene-level emitter dispatch has one signature
        ps = sample_position(self.mesh_data, sample2)
        return ps.replace(is_valid=ps.is_valid & active)

    def sample_position_pdf(self, ref_p, its, active):
        """weight * inv_total_area, gated on the hit being this mesh
        (area.cpp:48-59, mesh.cpp:457-466)."""
        ok = active & (its.mesh_id == self.mesh_index)
        inv_area = safe_div(1.0, self.mesh_data.total_area)
        return jnp.where(ok, self.sampling_weight * inv_area, 0.0)


def area_light_weight(radiance, mesh_data: MeshData):
    """Unnormalized sampling weight = total_area * luminance (area.cpp:9-14)."""
    return mesh_data.total_area * rgb2luminance(
        jax.lax.stop_gradient(radiance)
    )
