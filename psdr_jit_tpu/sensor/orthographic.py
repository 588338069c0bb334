"""Orthographic camera (reference: src/sensor/orthographic.cpp)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import mutable_pytree
from ..core import transform as xf
from ..core.math import norm, squared_norm
from .sensor import Sensor, SensorData, build_primary_edges


@mutable_pytree(
    leaves=("to_world_raw", "to_world_left", "to_world_right"),
    static=("near_clip", "far_clip"),
)
class OrthographicCamera(Sensor):
    def __init__(self, near=1e-6, far=1e7):
        self.near_clip = float(near)
        self.far_clip = float(far)
        self.to_world_raw = jnp.eye(4, dtype=jnp.float32)
        self.to_world_left = jnp.eye(4, dtype=jnp.float32)
        self.to_world_right = jnp.eye(4, dtype=jnp.float32)
        self.id = ""

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

    def configure_data(self, width: int, height: int, mesh_list=(),
                       mesh_datas=(), with_edges: bool = False,
                       to_world_raw=None, to_world_left=None,
                       to_world_right=None) -> SensorData:
        """orthographic.cpp:10-150."""
        aspect = float(width) / float(height)
        camera_to_sample = (
            xf.scale(jnp.asarray([-0.5, -0.5 * aspect, 1.0]))
            @ xf.translate(jnp.asarray([-1.0, -1.0 / aspect, 0.0]))
            @ xf.orthographic(self.near_clip, self.far_clip)
        )
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
        # importance normalisation = 1 / (world area of the view plane);
        # the reference scales by |vc|^2 (orthographic.cpp copy of
        # perspective.cpp:44), which wrongly couples W_e to the near clip.
        inv_area = 1.0 / (norm(v00 - v10) * norm(v11 - v10))

        edge_info = None
        if with_edges:
            edge_info = build_primary_edges(
                camera_pos, world_to_sample, mesh_list, mesh_datas,
                camera_dir=camera_dir,
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
            ortho=True,
        )

    def to_string(self) -> str:
        return "OrthographicCamera"

    __repr__ = to_string
