"""Interleaved A/B of small-scene intersect kernel variants (v5e).

The fused-step profile (2026-08-18) attributes ~183 ms/step to
ray_intersect_pallas at ~40-70%% of VPU op throughput; the candidates here
probe whether the Mosaic-scheduled triangle loop leaves throughput on the
table:

  base     current sweep_block (cluster cond-cull, rolled fori loops)
  nocull   no cluster AABB test — straight fori over all triangles
  u16      fully unrolled 16-triangle cluster sweep (Mosaic fori_loop
           only supports unroll=1 or full unroll)
  nc_u16   nocull + fully unrolled

Each variant runs K kernel calls inside ONE jit (carry-perturbed rays so
XLA cannot CSE the loop); per-call time = block_time / K.  Variants are
interleaved over several reps to reject machine-state drift (CLAUDE.md:
fresh-process numbers scatter over a 60-90 ms band).

RESULT (v5e, 2026-08-18, 32 tris / 32k rays): base 17.4 us/call min,
u16 17.6, nocull 43.6, nc_u16 40.3.  Unrolling is a wash — Mosaic already
schedules the rolled loop at the same throughput.  The no-cull numbers pin
the raw Moller-Trumbore sweep at ~1.4 Tops/s (32 tris x 32k rays x ~60
vector ops in 43.6 us), i.e. the inner loop is ALU-throughput-bound at the
VPU's practical ceiling for this op mix; the cluster cond-cull then wins
2.5x on top by skipping non-overlapping clusters.  Conclusion: the
small-scene kernel has no remaining headroom worth chasing — further
headline gains must come from pass structure, not this kernel.

Run alone: python scripts/kernel_ab.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psdr_jit_tpu.core.types import RAY_EPSILON

_INF = 1e30
LANES = 128
R_ROWS = 256
CLUSTER = 16
F = 32            # cbox triangle count
N = R_ROWS * LANES  # one 32k-ray tile, the in-context call shape
K = 2000          # kernel calls per timed block


def make_sweep(cull: bool, unroll: int):
    def sweep(tri_at, box_at, rays, n_clusters, init):
        rox, roy, roz, rdx, rdy, rdz = rays
        inv_dx, inv_dy, inv_dz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz

        def tri_body(j, carry):
            bt, bi, bu, bv = carry
            p0x, p0y, p0z = tri_at(0, j), tri_at(1, j), tri_at(2, j)
            e1x, e1y, e1z = tri_at(3, j), tri_at(4, j), tri_at(5, j)
            e2x, e2y, e2z = tri_at(6, j), tri_at(7, j), tri_at(8, j)
            hx = rdy * e2z - rdz * e2y
            hy = rdz * e2x - rdx * e2z
            hz = rdx * e2y - rdy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / a
            sx, sy, sz = rox - p0x, roy - p0y, roz - p0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (rdx * qx + rdy * qy + rdz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            hit = ((jnp.abs(a) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0) & (t > RAY_EPSILON) & (t < bt))
            return (jnp.where(hit, t, bt), jnp.where(hit, j, bi),
                    jnp.where(hit, u, bu), jnp.where(hit, v, bv))

        def cluster_body(c, lo, carry):
            # c/lo are PYTHON ints (static cluster loop) so the triangle
            # fori_loop has static bounds and admits unroll=.
            def run(carry):
                return jax.lax.fori_loop(lo, lo + CLUSTER, tri_body, carry,
                                         unroll=unroll)

            if not cull:
                return run(carry)
            lox, loy, loz = box_at(0, c), box_at(1, c), box_at(2, c)
            hix, hiy, hiz = box_at(3, c), box_at(4, c), box_at(5, c)
            bt = carry[0]
            tx0, tx1 = (lox - rox) * inv_dx, (hix - rox) * inv_dx
            ty0, ty1 = (loy - roy) * inv_dy, (hiy - roy) * inv_dy
            tz0, tz1 = (loz - roz) * inv_dz, (hiz - roz) * inv_dz
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            any_hit = jnp.any((tnear <= tfar) & (tfar > 0.0) & (tnear < bt))
            return jax.lax.cond(any_hit, run, lambda carry: carry, carry)

        carry = init
        for c in range(n_clusters):
            carry = cluster_body(c, c * CLUSTER, carry)
        return carry

    return sweep


def make_kernel(cull: bool, unroll: int, n_clusters: int):
    sweep = make_sweep(cull, unroll)

    def kernel(tri_ref, box_ref, ox, oy, oz, dx, dy, dz,
               out_t, out_id, out_u, out_v):
        rays = (ox[...], oy[...], oz[...], dx[...], dy[...], dz[...])
        shape = rays[0].shape
        init = (jnp.full(shape, _INF, jnp.float32),
                jnp.full(shape, -1, jnp.int32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32))
        bt, bi, bu, bv = sweep(lambda ch, j: tri_ref[ch, j],
                               lambda ch, c: box_ref[ch, c],
                               rays, n_clusters, init)
        out_t[...] = bt
        out_id[...] = jnp.where(bt < _INF, bi, -1)
        out_u[...] = bu
        out_v[...] = bv

    return kernel


def make_call(cull: bool, unroll: int):
    n_clusters = F // CLUSTER
    n_rows = N // LANES
    ray_spec = pl.BlockSpec((R_ROWS, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n_rows // R_ROWS,),
        in_specs=[ray_spec] * 6, out_specs=[ray_spec] * 4)
    call = pl.pallas_call(
        make_kernel(cull, unroll, n_clusters), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)])

    @jax.jit
    def bench(tri, boxes, comps):
        def body(i, acc):
            ox = comps[0] + 1e-12 * acc  # data-dep: defeat loop CSE
            out = call(tri, boxes, ox, *comps[1:])
            return acc + out[0][0, 0]

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    return bench


def main():
    rng = np.random.default_rng(0)
    p0 = rng.uniform(-1, 1, (F, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (F, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (F, 3)).astype(np.float32)
    tri = jnp.asarray(np.concatenate([p0.T, e1.T, e2.T], axis=0))
    nc = F // CLUSTER
    v0 = p0.reshape(nc, CLUSTER, 3)
    v1 = (p0 + e1).reshape(nc, CLUSTER, 3)
    v2 = (p0 + e2).reshape(nc, CLUSTER, 3)
    lo = np.minimum(np.minimum(v0.min(1), v1.min(1)), v2.min(1))
    hi = np.maximum(np.maximum(v0.max(1), v1.max(1)), v2.max(1))
    boxes = jnp.asarray(np.concatenate([lo.T, hi.T], axis=0))
    o = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    comps = tuple(jnp.asarray(o[:, i]).reshape(-1, LANES) for i in range(3)) \
        + tuple(jnp.asarray(d[:, i]).reshape(-1, LANES) for i in range(3))

    # Mosaic fori_loop only supports unroll=1 or full unroll (=num_steps)
    variants = {
        "base": make_call(True, 1),
        "nocull": make_call(False, 1),
        "u16": make_call(True, 16),
        "nc_u16": make_call(False, 16),
    }
    for name, fn in variants.items():
        float(fn(tri, boxes, comps))  # compile + warm
        print("compiled", name, flush=True)

    acc = {m: [] for m in variants}
    for rep in range(4):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            float(fn(tri, boxes, comps))
            acc[name].append((time.perf_counter() - t0) / K * 1e6)
    for name, ts in acc.items():
        print(f"{name}: min {min(ts):.1f} us/call  "
              f"mean {sum(ts)/len(ts):.1f}  reps={['%.1f' % x for x in ts]}")


if __name__ == "__main__":
    main()
