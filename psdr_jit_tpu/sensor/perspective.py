"""Perspective camera (reference: src/sensor/perspective.cpp)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import mutable_pytree
from ..core import transform as xf
from ..core.math import norm, squared_norm
from .sensor import Sensor, SensorData, build_primary_edges


@mutable_pytree(
    leaves=("to_world_raw", "to_world_left", "to_world_right"),
    static=("fov", "near_clip", "far_clip", "use_intrinsic", "fx", "fy", "cx", "cy"),
)
class PerspectiveCamera(Sensor):
    """User-facing perspective camera; fov-x or intrinsics parameterisation."""

    def __init__(self, fov=60.0, near=1e-6, far=1e7, *intrinsic_rest):
        if intrinsic_rest:
            # reference 6-float ctor: (fx, fy, cx, cy, near, far)
            assert len(intrinsic_rest) == 3
            fx, fy, cx = float(fov), float(near), float(far)
            cy, near, far = (float(v) for v in intrinsic_rest)
            self.fov = 60.0
            self.use_intrinsic = True
            self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
            self.near_clip = float(near)
            self.far_clip = float(far)
            self.to_world_raw = jnp.eye(4, dtype=jnp.float32)
            self.to_world_left = jnp.eye(4, dtype=jnp.float32)
            self.to_world_right = jnp.eye(4, dtype=jnp.float32)
            self.id = ""
            return
        self.fov = float(fov)
        self.near_clip = float(near)
        self.far_clip = float(far)
        self.use_intrinsic = False
        self.fx = self.fy = self.cx = self.cy = 0.0
        self.to_world_raw = jnp.eye(4, dtype=jnp.float32)
        self.to_world_left = jnp.eye(4, dtype=jnp.float32)
        self.to_world_right = jnp.eye(4, dtype=jnp.float32)
        self.id = ""

    @staticmethod
    def from_intrinsic(fx, fy, cx, cy, near=1e-6, far=1e7) -> "PerspectiveCamera":
        cam = PerspectiveCamera(60.0, near, far)
        cam.use_intrinsic = True
        cam.fx, cam.fy, cam.cx, cam.cy = float(fx), float(fy), float(cx), float(cy)
        return cam

    @property
    def to_world(self):
        return self.to_world_raw

    @to_world.setter
    def to_world(self, m):
        self.to_world_raw = jnp.asarray(m, jnp.float32)

    def set_transform(self, m, left: bool = True):
        if left:
            self.to_world_left = jnp.asarray(m, jnp.float32)
        else:
            self.to_world_right = jnp.asarray(m, jnp.float32)

    def append_transform(self, m, left: bool = True):
        m = jnp.asarray(m, jnp.float32)
        if left:
            self.to_world_left = m @ self.to_world_left
        else:
            self.to_world_right = self.to_world_right @ m

    def _camera_to_sample(self, aspect: float):
        """perspective.cpp:13-26."""
        if self.use_intrinsic:
            return (
                xf.scale(jnp.asarray([-0.5, -0.5, 1.0]))
                @ xf.translate(jnp.asarray([-1.0, -1.0, 0.0]))
                @ xf.perspective_intrinsic(
                    self.fx, self.fy, self.cx, self.cy,
                    self.near_clip, self.far_clip,
                )
            )
        return (
            xf.scale(jnp.asarray([-0.5, -0.5 * aspect, 1.0]))
            @ xf.translate(jnp.asarray([-1.0, -1.0 / aspect, 0.0]))
            @ xf.perspective(self.fov, self.near_clip, self.far_clip)
        )

    def configure_data(self, width: int, height: int, mesh_list=(),
                       mesh_datas=(), with_edges: bool = False,
                       to_world_raw=None, to_world_left=None,
                       to_world_right=None) -> SensorData:
        """Traced camera compile (perspective.cpp:10-152)."""
        aspect = float(width) / float(height)
        camera_to_sample = self._camera_to_sample(aspect)
        sample_to_camera = jnp.linalg.inv(camera_to_sample)

        m_raw = self.to_world_raw if to_world_raw is None else to_world_raw
        m_left = self.to_world_left if to_world_left is None else to_world_left
        m_right = self.to_world_right if to_world_right is None else to_world_right
        to_world = m_left @ m_raw @ m_right
        world_to_sample = camera_to_sample @ jnp.linalg.inv(to_world)

        camera_pos = xf.transform_pos(to_world, jnp.zeros(3, jnp.float32))
        camera_dir = xf.transform_dir(
            to_world, jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        )

        v00 = xf.transform_pos(sample_to_camera, jnp.asarray([0.0, 0.0, 0.0]))
        v10 = xf.transform_pos(sample_to_camera, jnp.asarray([1.0, 0.0, 0.0]))
        v11 = xf.transform_pos(sample_to_camera, jnp.asarray([1.0, 1.0, 0.0]))
        vc = xf.transform_pos(sample_to_camera, jnp.asarray([0.5, 0.5, 0.0]))
        inv_area = squared_norm(vc) / (norm(v00 - v10) * norm(v11 - v10))

        edge_info = None
        if with_edges:
            edge_info = build_primary_edges(
                camera_pos, world_to_sample, mesh_list, mesh_datas
            )

        return SensorData(
            sample_to_camera=sample_to_camera,
            to_world=to_world,
            world_to_sample=world_to_sample,
            camera_pos=camera_pos,
            camera_dir=camera_dir,
            inv_area=inv_area,
            edge_info=edge_info,
            width=width,
            height=height,
            ortho=False,
        )

    def to_string(self) -> str:
        return "PerspectiveCamera"

    __repr__ = to_string
