"""Sample record pytrees (reference: include/psdr/core/records.h,
bsdf/bsdf.h:11-19, sensor/sensor.h:10-19, edge/edge.h:13-23)."""

from __future__ import annotations

from typing import Any

from .types import pytree, Ray


@pytree
class SampleRecord:
    """Base record (records.h:39-44): every sample carries a pdf and a
    validity mask.  Exposed for API parity with the reference's
    ``SampleRecordC/D`` (psdr.cpp:252-258)."""

    pdf: Any       # (...,)
    is_valid: Any  # (...,) bool


@pytree
class PositionSample:
    """Emitter/mesh surface position sample (records.h:39-47)."""

    p: Any        # (..., 3)
    n: Any        # (..., 3)
    pdf: Any      # (...,)
    J: Any        # (...,) path-space Jacobian
    is_valid: Any # (...,) bool


@pytree
class BSDFSample:
    """BSDF direction sample (bsdf/bsdf.h:11-19)."""

    wo: Any       # (..., 3) local frame
    pdf: Any      # (...,)
    eta: Any      # (...,)
    is_valid: Any # (...,) bool


@pytree
class SensorDirectSample:
    """Projection of a world point to the sensor (sensor/sensor.h:10-19)."""

    q: Any           # (..., 2) sample-space position
    pixel_idx: Any   # (...,) int32, -1 if offscreen
    sensor_val: Any  # (...,) importance W_e
    is_valid: Any    # (...,) bool


@pytree
class PrimaryEdgeSample:
    """Primary (silhouette) edge sample (edge/edge.h:13-23)."""

    x_dot_n: Any  # (...,) differentiable screen-space normal velocity
    idx: Any      # (...,) pixel index (-1 invalid)
    ray_p: Ray    # ray offset +eps along edge normal
    ray_n: Ray    # ray offset -eps along edge normal
    pdf: Any      # (...,)


@pytree
class BoundarySegSample:
    """Secondary-edge boundary segment sample (records.h:50-59)."""

    p0: Any        # (..., 3) point on edge — differentiable through vertices
    edge: Any      # (..., 3) normalized edge direction (detached)
    edge2: Any     # (..., 3) edge-to-third-vertex direction (detached)
    p2: Any        # (..., 3) point on emitter
    n: Any         # (..., 3) emitter normal
    pdf: Any       # (...,)
    is_valid: Any  # (...,) bool
