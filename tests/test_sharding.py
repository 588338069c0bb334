"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The deterministic per-lane sample streams make any pixel partition reproduce
the full-frame sample set exactly (SURVEY.md §2.5) — so a sharded render must
equal the single-device render bitwise-ish.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import psdr_jit_tpu as psdr
from psdr_jit_tpu.parallel.mesh import make_device_mesh, render_sharded
from scenes import make_cbox


@pytest.fixture(scope="module")
def cbox():
    sc = make_cbox(width=32, height=32, spp=4)
    sc.configure()
    return sc


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_matches_single(cbox):
    integ = psdr.PathTracer(max_depth=1)
    single = np.asarray(integ.renderC(cbox, 0, seed=3))
    mesh = make_device_mesh(8)
    sharded = np.asarray(
        render_sharded(integ, cbox, mesh, sensor_id=0, seed=3)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_sharded_grad_matches_single(cbox):
    """Gradient of the sharded render == gradient of the single render."""
    sc = make_cbox(width=16, height=16, spp=4, sppe=4, sppse=4)
    sc.configure()
    integ = psdr.PathTracer(max_depth=1)
    mesh_obj = sc.meshes[-1]
    base = mesh_obj.to_world_raw
    mesh = make_device_mesh(8)

    def mean_single(tx):
        mesh_obj.to_world_raw = base.at[0, 3].add(tx)
        return jnp.mean(integ.renderD(sc, 0, seed=0))

    def mean_sharded(tx):
        mesh_obj.to_world_raw = base.at[0, 3].add(tx)
        return jnp.mean(
            render_sharded(integ, sc, mesh, sensor_id=0, seed=0, kind="D")
        )

    _, g1 = jax.jvp(mean_single, (jnp.float32(0.0),), (jnp.float32(1.0),))
    _, g2 = jax.jvp(mean_sharded, (jnp.float32(0.0),), (jnp.float32(1.0),))
    mesh_obj.to_world_raw = base
    np.testing.assert_allclose(float(g2), float(g1), rtol=1e-4, atol=1e-9)
