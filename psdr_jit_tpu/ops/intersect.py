"""Detached closest-hit ray/triangle intersection.

TPU-native replacement for the reference's OptiX backend
(``src/scene/scene_optix.cpp``).  The contract is the OptiX payload
(``scene_optix.cpp:400-404``): for each ray return

    ``(tri_id, valid, uv, t)``

with *global* triangle ids and barycentrics, always **detached** — the
differentiable part of an intersection is reconstructed from the payload by
``scene.reconstruct_intersection`` exactly like the reference's two-stage
formulation (``scene.cpp:612-806``).

Two implementations share the interface:

* :func:`ray_intersect_brute` — pure-JAX blocked Möller-Trumbore, used for
  correctness tests and as the CPU fallback,
* ``intersect_pallas.ray_intersect_pallas`` — tiled Pallas kernel keeping a
  ray tile resident in VMEM while streaming triangle blocks (the perf path).

Scenes in this problem domain are small (10^1..10^5 triangles) while rays are
many (10^6..10^8), so brute force over triangle blocks at full VPU utilization
beats divergent BVH traversal on TPU until triangle counts grow large; an LBVH
path can slot in behind the same interface later.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp

from ..core.types import RAY_EPSILON

_INF = 1e30


def _mt_block(p0, e1, e2, ray_o, ray_d):
    """Möller-Trumbore for a (R, 3) ray block against a (C, 3) tri block.

    Returns (t, u, v, hit) with shape (R, C).  Pure VPU math; divisions are
    guarded so degenerate triangles produce misses, not NaNs.
    """
    # (R, C, 3) broadcast
    d = ray_d[:, None, :]
    o = ray_o[:, None, :]
    e1b = e1[None, :, :]
    e2b = e2[None, :, :]
    h = jnp.cross(d, e2b)
    a = jnp.sum(e1b * h, axis=-1)
    f = jnp.where(jnp.abs(a) > 1e-12, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
    s = o - p0[None, :, :]
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1b)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2b * q, axis=-1)
    hit = (
        (jnp.abs(a) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > RAY_EPSILON)
    )
    return t, u, v, hit


def _closest_over_tris(p0, e1, e2, ray_o, ray_d, tri_chunk: int):
    """Scan triangle blocks for one ray block; returns best (t, id, u, v)."""
    f_pad = p0.shape[0]
    n_blocks = f_pad // tri_chunk
    r = ray_o.shape[0]

    def body(carry, blk):
        best_t, best_id, best_u, best_v = carry
        bp0, be1, be2, base = blk
        t, u, v, hit = _mt_block(bp0, be1, be2, ray_o, ray_d)
        t = jnp.where(hit, t, _INF)
        j = jnp.argmin(t, axis=-1)
        rows = jnp.arange(r)
        tj = t[rows, j]
        closer = tj < best_t
        best_id = jnp.where(closer, base + j, best_id)
        best_u = jnp.where(closer, u[rows, j], best_u)
        best_v = jnp.where(closer, v[rows, j], best_v)
        best_t = jnp.where(closer, tj, best_t)
        return (best_t, best_id, best_u, best_v), None

    init = (
        jnp.full((r,), _INF, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    if n_blocks == 1:
        (bt, bi, bu, bv), _ = body(init, (p0, e1, e2, jnp.int32(0)))
    else:
        blocks = (
            p0.reshape(n_blocks, tri_chunk, 3),
            e1.reshape(n_blocks, tri_chunk, 3),
            e2.reshape(n_blocks, tri_chunk, 3),
            jnp.arange(n_blocks, dtype=jnp.int32) * tri_chunk,
        )
        (bt, bi, bu, bv), _ = jax.lax.scan(body, init, blocks)
    return bt, bi, bu, bv


def ray_intersect_brute(
    p0, e1, e2, ray_o, ray_d, ray_chunk: int = 8192, tri_chunk: int = 256
):
    """Blocked brute-force closest hit.

    Args: ``p0/e1/e2``: (F, 3) triangle SoA; ``ray_o/ray_d``: (N, 3).
    Returns ``(tri_id (N,) int32 [-1 = miss], valid (N,) bool, uv (N, 2), t (N,))``.
    """
    f = p0.shape[0]
    n = ray_o.shape[0]
    tri_chunk = min(tri_chunk, max(8, f))
    f_pad = -(-f // tri_chunk) * tri_chunk
    if f_pad != f:
        pad = f_pad - f
        # degenerate padding triangles never hit (e1 = e2 = 0)
        p0 = jnp.concatenate([p0, jnp.zeros((pad, 3), p0.dtype)], axis=0)
        e1 = jnp.concatenate([e1, jnp.zeros((pad, 3), e1.dtype)], axis=0)
        e2 = jnp.concatenate([e2, jnp.zeros((pad, 3), e2.dtype)], axis=0)

    n_pad = -(-n // ray_chunk) * ray_chunk
    if n_pad != n:
        pad = n_pad - n
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)], axis=0)
        ray_d = jnp.concatenate(
            [ray_d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], ray_d.dtype), (pad, 1))],
            axis=0,
        )

    if n_pad == ray_chunk:
        bt, bi, bu, bv = _closest_over_tris(p0, e1, e2, ray_o, ray_d, tri_chunk)
    else:
        fn = functools.partial(_closest_over_tris, p0, e1, e2, tri_chunk=tri_chunk)
        ro = ray_o.reshape(-1, ray_chunk, 3)
        rd = ray_d.reshape(-1, ray_chunk, 3)
        bt, bi, bu, bv = jax.lax.map(lambda ab: fn(ab[0], ab[1]), (ro, rd))
        bt, bi, bu, bv = (x.reshape(-1) for x in (bt, bi, bu, bv))

    bt, bi, bu, bv = bt[:n], bi[:n], bu[:n], bv[:n]
    valid = bi >= 0
    uv = jnp.stack([bu, bv], axis=-1)
    t = jnp.where(valid, bt, _INF)
    return bi, valid, uv, t


def ray_intersect_detached(tri_p0, tri_e1, tri_e2, ray, active=None,
                           backend: str = "auto"):
    """Intersection entry point used by the scene layer.

    Everything is wrapped in ``stop_gradient`` — matching the reference where
    OptiX sees only detached rays (``scene_optix.cpp:358-375``).  NaN rays are
    masked out like ``scene_optix.cpp:348-353``.
    """
    p0 = jax.lax.stop_gradient(tri_p0)
    e1 = jax.lax.stop_gradient(tri_e1)
    e2 = jax.lax.stop_gradient(tri_e2)
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)

    finite = jnp.all(jnp.isfinite(o), axis=-1) & jnp.all(jnp.isfinite(d), axis=-1)
    if active is not None:
        finite = finite & active

    if backend == "auto":
        backend = _os.environ.get("PSDR_INTERSECT", "auto")
    # "interpret": run the full Pallas routing (incl. the sorted-ray BVH
    # path) through the Pallas interpreter — CPU tests of the exact
    # TPU-path program structure (e.g. sharded BVH/envmap consistency)
    interpret = backend == "interpret"
    use_pallas = backend in ("pallas", "interpret") or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    # The dense Pallas kernels need no ray substitution: their hit test is
    # a conjunction of comparisons, and any NaN/inf coordinate makes at
    # least one of them false (NaN compares false), so such rays miss by
    # construction (tested in test_intersect_pallas.py).  Two paths DO
    # need scrubbed rays: the brute path (blocked min-reductions are
    # poisoned by NaN t), and the BVH path taken above BVH_MIN_TRIS (its
    # tile-level culling aggregates min/max bounds over all rays of a
    # tile, so one NaN ray would cull every block for 8192 valid rays —
    # and poison the global sort bounds).
    from .intersect_pallas import BVH_MIN_TRIS

    if not use_pallas or p0.shape[0] > BVH_MIN_TRIS:
        o = jnp.where(finite[..., None], o, 0.0)
        d = jnp.where(
            finite[..., None], d, jnp.asarray([0.0, 0.0, 1.0], d.dtype)
        )

    shape = o.shape[:-1]
    o2 = o.reshape(-1, 3)
    d2 = d.reshape(-1, 3)

    if use_pallas:
        from .intersect_pallas import ray_intersect_pallas

        # liveness reaches the BVH path so dead/NaN lanes are parked
        # outside the scene (tile-level wavefront compaction, ops/bvh.py)
        tri_id, valid, uv, t = ray_intersect_pallas(
            p0, e1, e2, o2, d2, active=finite.reshape(-1),
            interpret=interpret,
        )
    else:
        tri_id, valid, uv, t = ray_intersect_brute(p0, e1, e2, o2, d2)

    tri_id = tri_id.reshape(shape)
    valid = valid.reshape(shape) & finite
    uv = uv.reshape(shape + (2,))
    t = t.reshape(shape)
    tri_id = jnp.where(valid, tri_id, -1)
    return tri_id, valid, uv, t
