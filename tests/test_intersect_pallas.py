"""Interpret-mode oracle tests for the Pallas intersection kernels.

The production TPU path (``ops/intersect_pallas.py``) never runs on the CPU
test backend, so these tests drive it with ``interpret=True`` — same kernel
code, executed by the Pallas interpreter — and check the OptiX payload
contract (reference scene_optix.cpp:400-404) against the numpy oracle and
the blocked-JAX brute backend.

Covered explicitly:
  * the scalar-SMEM small-scene path (<= 512 triangles),
  * the streamed-SMEM super-block path (> 512 triangles), including a case
    whose closest hit lands in a *later* super-block than an earlier valid
    hit (cross-step closest-hit state in the revisited output blocks),
  * cluster-AABB culling (spatially separated Morton-style clusters).
"""

import numpy as np
import jax.numpy as jnp

from psdr_jit_tpu.ops.intersect import ray_intersect_brute
from psdr_jit_tpu.ops.intersect_pallas import (
    ray_intersect_pallas,
    SMALL_MAX_TRIS,
    SUPER_TRIS,
)
from tests.test_intersect import _numpy_oracle, _random_scene, _check_against_oracle


def _run_pallas(p0, e1, e2, ro, rd):
    return ray_intersect_pallas(
        jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(ro), jnp.asarray(rd), interpret=True,
    )


def test_small_path_matches_oracle():
    p0, e1, e2, ro, rd = _random_scene(n_tri=97, n_ray=513, seed=10)
    assert p0.shape[0] <= SMALL_MAX_TRIS  # exercises the scalar-prefetch path
    tri_id, valid, uv, t = _run_pallas(p0, e1, e2, ro, rd)
    assert np.asarray(valid).any()
    _check_against_oracle(tri_id, uv, t, p0, e1, e2, ro, rd)


def test_small_path_agrees_with_brute():
    p0, e1, e2, ro, rd = _random_scene(n_tri=256, n_ray=700, seed=11)
    args = [jnp.asarray(x) for x in (p0, e1, e2, ro, rd)]
    pt = _run_pallas(p0, e1, e2, ro, rd)
    bt = ray_intersect_brute(*args)
    # t values must agree everywhere (ids may differ on f32 ties)
    np.testing.assert_allclose(
        np.where(np.asarray(pt[1]), np.asarray(pt[3]), 0.0),
        np.where(np.asarray(bt[1]), np.asarray(bt[3]), 0.0),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(pt[1]), np.asarray(bt[1]))


def test_super_block_path_matches_oracle():
    p0, e1, e2, ro, rd = _random_scene(n_tri=1200, n_ray=600, seed=12)
    assert p0.shape[0] > SMALL_MAX_TRIS  # forces >1 streamed super-block
    tri_id, valid, uv, t = _run_pallas(p0, e1, e2, ro, rd)
    assert np.asarray(valid).any()
    _check_against_oracle(tri_id, uv, t, p0, e1, e2, ro, rd)


def test_super_block_cross_step_closest_hit():
    """A ray that hits a far triangle in super-block 0 and a *nearer* one in
    super-block 1 (and vice versa) must keep the closest — this exercises the
    closest-hit state carried across grid steps in the revisited output
    blocks (intersect_pallas.py _kernel_super)."""
    n_tri = 2 * SUPER_TRIS  # exactly two super-blocks
    p0 = np.zeros((n_tri, 3), np.float32)
    e1 = np.zeros((n_tri, 3), np.float32)
    e2 = np.zeros((n_tri, 3), np.float32)
    # every triangle is a unit right triangle in an xy-plane at depth z_j
    # block 0 triangles sit at z = 10 + j*0.01 (far), except tri 5 at z = 1
    # block 1 triangles sit at z = 5 + j*0.01 (middle), except tri SUPER+7 at z = 0.5
    for j in range(n_tri):
        if j < SUPER_TRIS:
            z = 10.0 + j * 0.01
        else:
            z = 5.0 + (j - SUPER_TRIS) * 0.001
        p0[j] = (-1.0, -1.0, z)
        e1[j] = (2.0, 0.0, 0.0)
        e2[j] = (0.0, 2.0, 0.0)
    p0[5, 2] = 1.0          # block-0 triangle nearer than all of block 1
    p0[SUPER_TRIS + 7, 2] = 0.5  # block-1 triangle nearest of all

    ro = np.zeros((4, 3), np.float32)
    rd = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    # ray 0: straight up through everything -> nearest is block-1 tri at 0.5
    # ray 1: offset so it misses nothing -> same
    ro[1] = (-0.1, -0.1, 0.0)
    # ray 2: starts above the two special tris -> nearest is block-1 z=5.01...
    ro[2] = (0.0, 0.0, 2.0)
    # ray 3: starts above block 1 entirely -> nearest is block-0 z=10
    ro[3] = (0.0, 0.0, 9.0)

    tri_id, valid, uv, t = _run_pallas(p0, e1, e2, ro, rd)
    tri_id, t = np.asarray(tri_id), np.asarray(t)
    assert tri_id[0] == SUPER_TRIS + 7 and abs(t[0] - 0.5) < 1e-5
    assert tri_id[1] == SUPER_TRIS + 7 and abs(t[1] - 0.5) < 1e-5
    assert tri_id[2] == SUPER_TRIS and abs(t[2] - 3.0) < 1e-5
    assert tri_id[3] == 0 and abs(t[3] - 1.0) < 1e-5


def test_cluster_culling_correct():
    """Clusters far outside every ray's path must be skipped without
    changing results: two spatially separated 64-triangle clusters, rays
    aimed only at one of them."""
    rng = np.random.default_rng(13)
    n = 128  # two 64-triangle clusters
    p0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    # second cluster displaced far away in +x
    p0[64:, 0] += 1000.0
    e1 = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    ro = rng.uniform(-2, 2, (200, 3)).astype(np.float32)
    rd = rng.normal(size=(200, 3)).astype(np.float32)
    rd[:, 0] = -np.abs(rd[:, 0]) - 0.5  # point away from the far cluster
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    tri_id, valid, uv, t = _run_pallas(p0, e1, e2, ro, rd)
    oid, ouv, ot = _numpy_oracle(p0, e1, e2, ro, rd)
    np.testing.assert_array_equal(np.asarray(tri_id), oid)
    hit = oid >= 0
    np.testing.assert_allclose(np.asarray(t)[hit], ot[hit], rtol=1e-4)


def test_degenerate_and_miss_rays():
    """Zero-area padding triangles and all-miss rays give tri_id == -1."""
    p0 = np.asarray([[-1, -1, 2.0], [0, 0, 0]], np.float32)
    e1 = np.asarray([[2, 0, 0], [0, 0, 0]], np.float32)  # tri 1 degenerate
    e2 = np.asarray([[0, 2, 0], [0, 0, 0]], np.float32)
    ro = np.zeros((3, 3), np.float32)
    rd = np.asarray(
        [[0, 0, 1], [0, 0, -1], [1, 0, 0]], np.float32
    )
    tri_id, valid, uv, t = _run_pallas(p0, e1, e2, ro, rd)
    tri_id = np.asarray(tri_id)
    assert tri_id[0] == 0
    assert tri_id[1] == -1 and not bool(valid[1])
    assert tri_id[2] == -1


def test_nan_inf_rays_miss_by_construction():
    """The detached entry point skips ray substitution on the Pallas path:
    the kernel's conjunctive hit test makes any NaN/inf coordinate miss
    (ops/intersect.py ray_intersect_detached)."""
    rng = np.random.default_rng(11)
    p0 = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    ro = np.zeros((8, 3), np.float32)
    rd = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (8, 1))
    ro[1, 0] = np.nan
    rd[2, 2] = np.nan
    ro[3, 1] = np.inf
    rd[4, 0] = -np.inf
    rd[5] = np.nan
    tri_id, valid, uv, t = _run_pallas(p0, e1, e2, ro, rd)
    tri_id = np.asarray(tri_id)
    for i in (1, 2, 3, 4, 5):
        assert tri_id[i] == -1 and not bool(valid[i]), i
    assert np.isfinite(np.asarray(t)[[1, 2, 3, 4, 5]]).all()
