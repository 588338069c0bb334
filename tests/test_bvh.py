"""Tests for the sorted-ray block-culled intersection path (ops/bvh.py) —
the TPU-native equivalent of the reference's OptiX GAS traversal
(scene_optix.cpp:265-333, 344-410)."""

import numpy as np
import jax
import jax.numpy as jnp

from psdr_jit_tpu.ops.bvh import (
    ray_intersect_bvh,
    sort_rays,
    tile_block_visit,
    build_fetch_list,
)
from tests.test_intersect import _numpy_oracle, _random_scene, _check_against_oracle


def test_sort_rays_roundtrip():
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-3, 3, (1000, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(1000, 3)), jnp.float32)
    perm, inv = sort_rays(o, d)
    perm, inv = np.asarray(perm), np.asarray(inv)
    assert sorted(perm.tolist()) == list(range(1000))
    np.testing.assert_array_equal(perm[inv], np.arange(1000))
    # sorted octants are non-decreasing
    dd = np.asarray(d)[perm]
    oct_ = (dd[:, 0] < 0) * 1 + (dd[:, 1] < 0) * 2 + (dd[:, 2] < 0) * 4
    assert (np.diff(oct_) >= 0).all()


def test_tile_block_visit_is_conservative():
    """Every true ray-block hit must be marked visited (no false culls)."""
    rng = np.random.default_rng(1)
    tile = 256
    n = 4 * tile
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    block_lo = rng.uniform(-3, 1, (16, 3)).astype(np.float32)
    block_hi = block_lo + rng.uniform(0.2, 2.0, (16, 3)).astype(np.float32)

    visit, _ = tile_block_visit(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(block_lo), jnp.asarray(block_hi), tile,
    )
    visit = np.asarray(visit)

    # exact per-ray slab test
    inv_d = 1.0 / d
    t0 = (block_lo[None] - o[:, None]) * inv_d[:, None]
    t1 = (block_hi[None] - o[:, None]) * inv_d[:, None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    ray_hit = (tn <= tf) & (tf > 0)                 # (n, 16)
    tile_hit = ray_hit.reshape(4, tile, 16).any(axis=1)
    assert (visit | ~tile_hit).all(), "conservative culling missed a hit"


def test_build_fetch_list():
    visit = jnp.asarray([
        [False, True, False, True],
        [False, False, False, False],
        [True, True, True, True],
    ])
    fetch, counts, tn0 = build_fetch_list(visit)
    fetch, counts = np.asarray(fetch), np.asarray(counts)
    np.testing.assert_array_equal(counts, [2, 0, 4])
    np.testing.assert_array_equal(fetch[0], [1, 3, 3, 3])  # pad repeats last
    np.testing.assert_array_equal(fetch[2], [0, 1, 2, 3])
    # front-to-back ordering by entry distance
    tn = jnp.asarray([[9., 1., 9., 5.], [0.] * 4, [3., 2., 1., 0.]])
    fetch2, counts2, tns = build_fetch_list(visit, tn)
    np.testing.assert_array_equal(np.asarray(counts2), [2, 0, 4])
    np.testing.assert_array_equal(np.asarray(fetch2)[0], [1, 3, 3, 3])
    np.testing.assert_array_equal(np.asarray(fetch2)[2], [3, 2, 1, 0])
    # per-slot conservative entry distances follow the fetch order
    np.testing.assert_array_equal(np.asarray(tns)[2], [0., 1., 2., 3.])
    np.testing.assert_array_equal(np.asarray(tn0), np.zeros((3, 4)))


def _run(p0, e1, e2, ro, rd, sort=True):
    return ray_intersect_bvh(
        jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(ro), jnp.asarray(rd), interpret=True, sort=sort,
    )


def test_bvh_matches_oracle_incoherent():
    p0, e1, e2, ro, rd = _random_scene(n_tri=1200, n_ray=700, seed=20)
    tri_id, valid, uv, t = _run(p0, e1, e2, ro, rd)
    assert np.asarray(valid).any()
    _check_against_oracle(tri_id, uv, t, p0, e1, e2, ro, rd)


def test_bvh_matches_oracle_unsorted():
    p0, e1, e2, ro, rd = _random_scene(n_tri=600, n_ray=300, seed=21)
    tri_id, valid, uv, t = _run(p0, e1, e2, ro, rd, sort=False)
    _check_against_oracle(tri_id, uv, t, p0, e1, e2, ro, rd)


def test_bvh_culling_actually_skips_blocks():
    """Separated clusters + coherent rays: most tiles must visit a strict
    subset of blocks, and the result still matches the oracle."""
    rng = np.random.default_rng(22)
    n_tri = 2048  # 4 blocks
    p0 = rng.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    # spread blocks far apart in x
    for b in range(4):
        p0[b * 512:(b + 1) * 512, 0] += b * 100.0
    e1 = rng.uniform(-0.5, 0.5, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (n_tri, 3)).astype(np.float32)
    # rays above block 2 pointing down in a narrow cone: only block 2's
    # AABB is reachable
    ro = rng.uniform(-2, 2, (9000, 3)).astype(np.float32)
    ro[:, 0] += 200.0
    ro[:, 2] += 8.0
    rd = rng.normal(size=(9000, 3)).astype(np.float32) * 0.1
    rd[:, 2] = -1.0
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    tri_id, valid, uv, t = _run(p0, e1, e2, ro, rd)
    oid, ouv, ot = _numpy_oracle(p0, e1, e2, ro, rd)
    np.testing.assert_array_equal(np.asarray(tri_id), oid)

    # verify the culling statistics directly
    from psdr_jit_tpu.ops.bvh import TILE_ROWS, LANES, SUPER
    tile = TILE_ROWS * LANES
    n_pad = -(-9000 // tile) * tile
    ro_p = np.concatenate([ro, np.zeros((n_pad - 9000, 3), np.float32)])
    rd_p = np.concatenate(
        [rd, np.tile([[0, 0, 1]], (n_pad - 9000, 1)).astype(np.float32)]
    )
    perm, _ = sort_rays(jnp.asarray(ro_p), jnp.asarray(rd_p))
    ro_s = np.asarray(jnp.take(jnp.asarray(ro_p), perm, axis=0))
    rd_s = np.asarray(jnp.take(jnp.asarray(rd_p), perm, axis=0))
    v0 = p0.reshape(-1, 64, 3)
    lo = np.stack([v0.min(1), (v0 + e1.reshape(-1, 64, 3)).min(1),
                   (v0 + e2.reshape(-1, 64, 3)).min(1)]).min(0)
    hi = np.stack([v0.max(1), (v0 + e1.reshape(-1, 64, 3)).max(1),
                   (v0 + e2.reshape(-1, 64, 3)).max(1)]).max(0)
    block_lo = lo.reshape(4, 8, 3).min(1)
    block_hi = hi.reshape(4, 8, 3).max(1)
    visit, _ = tile_block_visit(
        jnp.asarray(ro_s), jnp.asarray(rd_s),
        jnp.asarray(block_lo), jnp.asarray(block_hi), tile,
    )
    visit = np.asarray(visit)
    # rays only reach block 2: on average tiles visit few blocks
    assert visit.mean() < 0.75, f"no culling: visit rate {visit.mean()}"
    assert visit[:, 2].all()  # the hit block is always visited


def test_bvh_cross_block_closest_hit():
    """Closest hit must win across blocks fetched in list order."""
    n_tri = 1024  # 2 blocks
    p0 = np.zeros((n_tri, 3), np.float32)
    e1 = np.tile(np.asarray([[2.0, 0, 0]], np.float32), (n_tri, 1))
    e2 = np.tile(np.asarray([[0, 2.0, 0]], np.float32), (n_tri, 1))
    for j in range(n_tri):
        z = 10.0 + j * 0.01 if j < 512 else 5.0 + (j - 512) * 0.001
        p0[j] = (-1.0, -1.0, z)
    p0[700, 2] = 0.5  # block-1 triangle nearest
    ro = np.zeros((4, 3), np.float32)
    ro[2] = (0.0, 0.0, 9.0)  # above block 1 -> block-0 z=10 is nearest
    rd = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (4, 1))
    tri_id, valid, uv, t = _run(p0, e1, e2, ro, rd)
    tri_id, t = np.asarray(tri_id), np.asarray(t)
    assert tri_id[0] == 700 and abs(t[0] - 0.5) < 1e-5
    assert tri_id[2] == 0 and abs(t[2] - 1.0) < 1e-5


def test_bvh_dead_lane_parking():
    """Inactive lanes are parked outside the scene: they return no hits and
    live lanes' results are unchanged vs the all-active call."""
    p0, e1, e2, ro, rd = _random_scene(n_tri=600, n_ray=512, seed=23)
    rng = np.random.default_rng(24)
    active = jnp.asarray(rng.uniform(size=512) < 0.4)
    tri_a, val_a, uv_a, t_a = ray_intersect_bvh(
        jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(ro), jnp.asarray(rd), interpret=True)
    tri_p, val_p, uv_p, t_p = ray_intersect_bvh(
        jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(ro), jnp.asarray(rd), active=active, interpret=True)
    live = np.asarray(active)
    # parked lanes never hit
    assert not np.asarray(val_p)[~live].any()
    # live lanes identical to the unparked call
    np.testing.assert_array_equal(np.asarray(tri_a)[live],
                                  np.asarray(tri_p)[live])
    np.testing.assert_allclose(np.asarray(t_a)[live],
                               np.asarray(t_p)[live], rtol=1e-6)


def test_bvh_proxy_tbound_equality():
    """The guaranteed-occluder proxy pre-pass (PSDR_BVH_PROXY) is a pure
    optimization: results identical to the plain path.  Fresh jit wrappers
    per variant — ray_intersect_bvh's own jaxpr cache is keyed on shapes
    and statics only, so flipping the module knob without a fresh wrapper
    silently reuses the first trace (the staleness found 2026-08-20)."""
    import jax as _jax
    from psdr_jit_tpu.ops import bvh as _bvh

    p0, e1, e2, ro, rd = _random_scene(n_tri=900, n_ray=640, seed=31)
    # add a big floor triangle below everything so the proxy has a real
    # large-area occluder to bound downward rays with
    p0 = np.concatenate([p0, [[-50, -50, -5]]]).astype(np.float32)
    e1 = np.concatenate([e1, [[100, 0, 0]]]).astype(np.float32)
    e2 = np.concatenate([e2, [[0, 100, 0]]]).astype(np.float32)
    args = (jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(ro), jnp.asarray(rd))
    impl = _bvh.ray_intersect_bvh.__wrapped__
    old = _bvh.PROXY_TRIS
    try:
        _bvh.PROXY_TRIS = 0
        r0 = _jax.jit(impl, static_argnames=("interpret", "sort"))(
            *args, interpret=True)
        _bvh.PROXY_TRIS = 64
        r1 = _jax.jit(impl, static_argnames=("interpret", "sort"))(
            *args, interpret=True)
    finally:
        _bvh.PROXY_TRIS = old
    for a, b in zip(r0, r1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
