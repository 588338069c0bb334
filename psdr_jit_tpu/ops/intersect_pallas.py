"""Pallas TPU kernel for closest-hit ray/triangle intersection.

Replaces the reference's OptiX GAS + ``jit_optix_ray_trace`` launch
(``scene_optix.cpp:265-333, 344-410``) with a VPU wavefront kernel.

Design (the parts that matter on TPU, learned the hard way):

* **HBM interface**: every big array is dense ``(rows, 128)`` f32 — an
  ``(N, 1)`` operand layout forces 128x tile padding (4 GB per temp at 8M
  rays).
* **Scalar triangle loop over a big ray tile**: each triangle broadcasts
  nine scalars against a (256, 128) = 32768-ray tile of dense VPU math.
  Scenes up to 512 triangles stage all scalars in SMEM via scalar
  prefetch; larger scenes stream 512-triangle super-blocks through SMEM
  with a second grid dimension (scalar-prefetch arrays are whole-array
  only and spill SMEM beyond ~700 triangles, which costs 1000x; dynamic
  lane indexing of VMEM does not compile, so VMEM triangle tables are
  out).  Closest-hit state persists across super-block steps in the
  revisited output blocks.
* **Two-level culling**: triangles arrive Morton-ordered in 64-triangle
  clusters; each cluster AABB is slab-tested against the whole ray tile
  and skipped when no ray can improve its current closest hit.

All math is f32 (the Plucker/matmul formulation has contraction depth 6,
which wastes 122/128 of the MXU — this workload belongs on the VPU).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import RAY_EPSILON

_INF = 1e30
LANES = 128
MAX_KERNEL_TRIS = 1 << 20  # above this, fall back to the blocked JAX path
# above this, the sorted-ray block-culled path (ops/bvh.py) replaces dense
# block streaming.  Default lowered 16384 -> 4096 after an interleaved
# step-level A/B on the 4968-tri envmap bunny (scripts/envmap_ab.py,
# 2026-08-19): tile culling 1272.6 vs dense 1552.8 ms/step (1.22x),
# identical loss.  Below ~8 super-blocks the sort + (tile, block) interval
# math has little to cull, so smaller scenes keep the dense path.
BVH_MIN_TRIS = int(_os.environ.get("PSDR_BVH_MIN_TRIS", "4096"))

# Small scenes use a scalar-triangle loop with SMEM-prefetched triangle
# data — ~2x faster than the rotation kernel because it never pads the
# triangle count to 128 and runs one big (R, 128) op per triangle.  Beyond
# ~700 triangles the scalars spill SMEM and the loop becomes
# HBM-latency-bound (1000x collapse), so the cutoff stays conservative.
SMALL_MAX_TRIS = 512
# Rays per kernel tile = R_ROWS_SMALL * 128.  Finer tiles give the
# cluster-cull (sweep_block any_hit) finer skip granularity and a smaller
# VMEM working set per grid step; the per-grid-step overhead bounds the
# win from below.  Swept interleaved on the cbox headline fused step
# (scripts/rrows_ab.py, v5e 2026-08-20, losses bitwise-identical): 256 →
# 522.4/521.3 ms/step (mean/min), 128 → ~520, 64 → 514.1/513.4, 32 →
# ~518, 16 → ~525.  64 is the knee.
R_ROWS_SMALL = int(_os.environ.get("PSDR_DENSE_ROWS", "64"))
# Park dead lanes outside the scene AABB on the DENSE paths too (the BVH
# path has always parked): a parked ray fails every cluster slab test, so
# a tile of parked lanes skips every triangle loop.  Only useful when the
# caller CONCENTRATES dead lanes into whole tiles — and the one caller
# with a massively-dead lane set (the SE pass) measured the concentration
# sort as a net loss (see integrator/base PSDR_SE_SORT refutation), so
# parking defaults OFF; invalid-bss SE lanes carry NaN-ish directions
# that miss every cluster anyway.
DENSE_PARK = _os.environ.get("PSDR_DENSE_PARK", "0") != "0"
# Cluster granularity: triangle counts pad up to a cluster and culling is
# per cluster-AABB, so small clusters cut padding AND cull finer at ~25
# extra VPU ops per slab test.  v5e A/B on cbox renderC depth=3
# (scripts/cluster_ab.py, 2026-08-17): 64 -> 219.6 ms/step, 32 -> 173.1,
# 16 -> 172.6, 8 -> 175.3.
CLUSTER_SMALL = 16
SUPER_TRIS = 512      # triangles per streamed SMEM super-block (large path)


def sweep_block(tri_at, box_at, rays, base, cluster: int, n_clusters: int,
                init):
    """Cluster-culled Möller-Trumbore closest-hit sweep over ONE SMEM
    triangle block — THE hit test (utils.h:83-93 epsilon/tie policy),
    shared by the small-scene kernel, the streamed super-block kernel and
    the BVH indexed-streaming kernel (ops/bvh.py) so a fix to the
    epsilon/degenerate handling can never diverge between backends.

    ``tri_at(ch, j)`` / ``box_at(ch, c)``: SMEM scalar accessors (the
    kernels stage their scalars in different block layouts); ``rays``:
    (rox, roy, roz, rdx, rdy, rdz) VMEM tiles; ``base``: global id of the
    block's first triangle; ``init``: (t, id, u, v) running carry.
    Returns the updated carry.
    """
    rox, roy, roz, rdx, rdy, rdz = rays
    inv_dx = 1.0 / rdx
    inv_dy = 1.0 / rdy
    inv_dz = 1.0 / rdz

    def tri_body(j, carry):
        bt, bi, bu, bv = carry
        p0x = tri_at(0, j)
        p0y = tri_at(1, j)
        p0z = tri_at(2, j)
        e1x = tri_at(3, j)
        e1y = tri_at(4, j)
        e1z = tri_at(5, j)
        e2x = tri_at(6, j)
        e2y = tri_at(7, j)
        e2z = tri_at(8, j)
        hx = rdy * e2z - rdz * e2y
        hy = rdz * e2x - rdx * e2z
        hz = rdx * e2y - rdy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / a  # inf at a=0; masked by the hit test below
        sx = rox - p0x
        sy = roy - p0y
        sz = roz - p0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (rdx * qx + rdy * qy + rdz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        hit = (
            (jnp.abs(a) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > RAY_EPSILON)
            & (t < bt)
        )
        bt = jnp.where(hit, t, bt)
        bi = jnp.where(hit, base + j, bi)
        bu = jnp.where(hit, u, bu)
        bv = jnp.where(hit, v, bv)
        return bt, bi, bu, bv

    def cluster_body(c, carry):
        lox = box_at(0, c)
        loy = box_at(1, c)
        loz = box_at(2, c)
        hix = box_at(3, c)
        hiy = box_at(4, c)
        hiz = box_at(5, c)
        bt = carry[0]
        tx0 = (lox - rox) * inv_dx
        tx1 = (hix - rox) * inv_dx
        ty0 = (loy - roy) * inv_dy
        ty1 = (hiy - roy) * inv_dy
        tz0 = (loz - roz) * inv_dz
        tz1 = (hiz - roz) * inv_dz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        any_hit = jnp.any((tnear <= tfar) & (tfar > 0.0) & (tnear < bt))

        def run(carry):
            lo = c * cluster
            return jax.lax.fori_loop(lo, lo + cluster, tri_body, carry)

        return jax.lax.cond(any_hit, run, lambda carry: carry, carry)

    return jax.lax.fori_loop(0, n_clusters, cluster_body, init)


def _kernel_small(f_pad: int, n_clusters: int):
    def kernel(tri_ref, box_ref, ox, oy, oz, dx, dy, dz,
               out_t, out_id, out_u, out_v):
        """tri_ref: (9, f_pad) SMEM; box_ref: (6, n_clusters) SMEM."""
        rays = (ox[...], oy[...], oz[...], dx[...], dy[...], dz[...])
        shape = rays[0].shape
        init = (
            jnp.full(shape, _INF, jnp.float32),
            jnp.full(shape, -1, jnp.int32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
        )
        bt, bi, bu, bv = sweep_block(
            lambda ch, j: tri_ref[ch, j], lambda ch, c: box_ref[ch, c],
            rays, 0, CLUSTER_SMALL, n_clusters, init,
        )
        out_t[...] = bt
        out_id[...] = jnp.where(bt < _INF, bi, -1)
        out_u[...] = bu
        out_v[...] = bv

    return kernel


def _kernel_super(n_super: int):
    """Streaming variant of the scalar-loop kernel for arbitrary scene
    sizes: the grid's second dimension walks 512-triangle super-blocks whose
    scalars are staged into SMEM per step (regular SMEM BlockSpec slices —
    scalar-prefetch arrays are whole-array only and overflow SMEM beyond
    ~700 triangles).  Closest-hit state lives in the revisited output
    blocks, initialised at the first super-block step."""

    def kernel(tri_ref, box_ref, ox, oy, oz, dx, dy, dz,
               out_t, out_id, out_u, out_v):
        """tri_ref: (1, 9, SUPER) SMEM; box_ref: (1, 6, SUPER//16) SMEM."""
        j_super = pl.program_id(1)
        rays = (ox[...], oy[...], oz[...], dx[...], dy[...], dz[...])
        shape = rays[0].shape

        @pl.when(j_super == 0)
        def _():
            out_t[...] = jnp.full(shape, _INF, jnp.float32)
            out_id[...] = jnp.full(shape, -1, jnp.int32)
            out_u[...] = jnp.zeros(shape, jnp.float32)
            out_v[...] = jnp.zeros(shape, jnp.float32)

        init = (out_t[...], out_id[...], out_u[...], out_v[...])
        bt, bi, bu, bv = sweep_block(
            lambda ch, j: tri_ref[0, ch, j], lambda ch, c: box_ref[0, ch, c],
            rays, j_super * SUPER_TRIS, CLUSTER_SMALL,
            SUPER_TRIS // CLUSTER_SMALL, init,
        )
        out_t[...] = bt
        out_id[...] = bi
        out_u[...] = bu
        out_v[...] = bv

    return kernel


def _call_super(f_pad, n_pad, tri_s, boxes_s, ray_comps, interpret):
    """tri_s: (n_super, 9, SUPER); boxes_s: (n_super, 6, SUPER//64)."""
    n_super = tri_s.shape[0]
    n_rows = n_pad // LANES
    grid = (n_rows // R_ROWS_SMALL, n_super)
    ray_spec = pl.BlockSpec(
        (R_ROWS_SMALL, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (1, 9, SUPER_TRIS), lambda i, j: (j, 0, 0), memory_space=pltpu.SMEM
    )
    box_spec = pl.BlockSpec(
        (1, 6, SUPER_TRIS // CLUSTER_SMALL), lambda i, j: (j, 0, 0),
        memory_space=pltpu.SMEM,
    )
    out = pl.pallas_call(
        _kernel_super(n_super),
        grid=grid,
        in_specs=[tri_spec, box_spec] + [ray_spec] * 6,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(tri_s, boxes_s, *ray_comps)
    out_t, out_id, out_u, out_v = out
    out_id = jnp.where(out_t < _INF, out_id, -1)
    return out_t, out_id, out_u, out_v


def _call_small(f_pad, n_pad, tri, boxes, ray_comps, interpret):
    n_clusters = f_pad // CLUSTER_SMALL
    n_rows = n_pad // LANES
    grid = (n_rows // R_ROWS_SMALL,)
    ray_spec = pl.BlockSpec(
        (R_ROWS_SMALL, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[ray_spec] * 6,
        out_specs=[ray_spec] * 4,
    )
    return pl.pallas_call(
        _kernel_small(f_pad, n_clusters),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(tri, boxes, *ray_comps)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ray_intersect_pallas(p0, e1, e2, ray_o, ray_d, active=None,
                         interpret: bool = False):
    """Closest hit for (N, 3) rays against (F, 3) triangles.

    Returns ``(tri_id, valid, uv, t)`` — the OptiX payload contract
    (scene_optix.cpp:400-404).  Triangle order should be cluster-friendly
    (the scene layer Morton-sorts at configure time); returned ids refer to
    the order given here.  ``active``: dead lanes are PARKED outside the
    scene AABB (BVH path: self-culling tiles; dense paths: every cluster
    slab test fails, so all-dead tiles skip every triangle loop — callers
    with low-validity lane sets sort lanes by liveness first).

    NOTE on hit selection: within a block, later-visited triangles win ties
    and equal-t races are broken by visit order (not lowest id); tri_id may
    differ from the brute-force oracle only where two hits coincide within
    f32 rounding.
    """
    f = p0.shape[0]
    if f > MAX_KERNEL_TRIS:
        from .intersect import ray_intersect_brute

        return ray_intersect_brute(p0, e1, e2, ray_o, ray_d)
    if f > BVH_MIN_TRIS:
        from .bvh import ray_intersect_bvh

        return ray_intersect_bvh(p0, e1, e2, ray_o, ray_d, active=active,
                                 interpret=interpret)

    if active is not None and DENSE_PARK:
        hi_scene = jnp.max(
            jnp.maximum(jnp.maximum(p0, p0 + e1), p0 + e2), axis=0
        )
        lo_scene = jnp.min(
            jnp.minimum(jnp.minimum(p0, p0 + e1), p0 + e2), axis=0
        )
        park = hi_scene + 0.5 * jnp.maximum(hi_scene - lo_scene, 1.0)
        # +z from above the scene top: tfar < 0 on the z slab of every
        # cluster (same parking geometry as ops/bvh.py)
        ray_o = jnp.where(active[:, None], ray_o, park)
        ray_d = jnp.where(
            active[:, None], ray_d,
            jnp.asarray([0.0, 0.0, 1.0], ray_d.dtype),
        )

    n = ray_o.shape[0]
    small = f <= SMALL_MAX_TRIS
    if small:
        f_pad = -(-f // CLUSTER_SMALL) * CLUSTER_SMALL
    else:
        f_pad = -(-f // SUPER_TRIS) * SUPER_TRIS
    tile = R_ROWS_SMALL * LANES
    n_pad = -(-n // tile) * tile

    def pad_tri(x):
        return jnp.pad(x, ((0, f_pad - f), (0, 0))) if f_pad != f else x

    p0p, e1p, e2p = pad_tri(p0), pad_tri(e1), pad_tri(e2)

    def pad_ray(x, fill):
        if n_pad != n:
            x = jnp.concatenate(
                [x, jnp.full((n_pad - n,), fill, x.dtype)], axis=0
            )
        return x.reshape(n_pad // LANES, LANES)

    ray_comps = [pad_ray(ray_o[:, i], 0.0) for i in range(3)] + [
        pad_ray(ray_d[:, i], 1.0) for i in range(3)
    ]

    if small:
        tri = jnp.concatenate([p0p.T, e1p.T, e2p.T], axis=0)  # (9, f_pad)
        nc = f_pad // CLUSTER_SMALL
        v0 = p0p.reshape(nc, CLUSTER_SMALL, 3)
        v1 = (p0p + e1p).reshape(nc, CLUSTER_SMALL, 3)
        v2 = (p0p + e2p).reshape(nc, CLUSTER_SMALL, 3)
        lo = jnp.minimum(jnp.minimum(v0.min(1), v1.min(1)), v2.min(1))
        hi = jnp.maximum(jnp.maximum(v0.max(1), v1.max(1)), v2.max(1))
        boxes = jnp.concatenate([lo.T, hi.T], axis=0)  # (6, nc)
        out_t, out_id, out_u, out_v = _call_small(
            f_pad, n_pad, tri, boxes, ray_comps, interpret
        )
    else:
        n_super = f_pad // SUPER_TRIS
        packed = jnp.concatenate([p0p.T, e1p.T, e2p.T], axis=0)  # (9, f_pad)
        tri_s = jnp.transpose(
            packed.reshape(9, n_super, SUPER_TRIS), (1, 0, 2)
        )  # (n_super, 9, SUPER)
        nc_total = f_pad // CLUSTER_SMALL
        v0 = p0p.reshape(nc_total, CLUSTER_SMALL, 3)
        v1 = (p0p + e1p).reshape(nc_total, CLUSTER_SMALL, 3)
        v2 = (p0p + e2p).reshape(nc_total, CLUSTER_SMALL, 3)
        lo = jnp.minimum(jnp.minimum(v0.min(1), v1.min(1)), v2.min(1))
        hi = jnp.maximum(jnp.maximum(v0.max(1), v1.max(1)), v2.max(1))
        boxes = jnp.concatenate([lo.T, hi.T], axis=0)  # (6, nc_total)
        boxes_s = jnp.transpose(
            boxes.reshape(6, n_super, SUPER_TRIS // CLUSTER_SMALL), (1, 0, 2)
        )  # (n_super, 6, clusters_per_super)
        out_t, out_id, out_u, out_v = _call_super(
            f_pad, n_pad, tri_s, boxes_s, ray_comps, interpret
        )

    tri_id = out_id.reshape(-1)[:n]
    t = out_t.reshape(-1)[:n]
    valid = tri_id >= 0
    uv = jnp.stack([out_u.reshape(-1)[:n], out_v.reshape(-1)[:n]], axis=-1)
    return tri_id, valid, uv, t
