"""Validate + benchmark the sorted-ray block-culled intersection path on
the real TPU against the dense streaming kernel.

VERDICT round-1 done criterion: a >=100k-triangle incoherent-ray scene
>=20x faster than the streamed-SMEM path, identical hits vs the oracle.

Run alone: nohup python -u scripts/bvh_perf.py > /tmp/bvh_perf.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from psdr_jit_tpu.ops.bvh import ray_intersect_bvh
from psdr_jit_tpu.ops.intersect_pallas import _call_super, SUPER_TRIS, LANES, R_ROWS_SMALL

N_TRI = 100_000
N_RAY = 1 << 21  # 2M rays


def make_scene(n_tri, seed=0):
    """Morton-ordered triangle soup filling a unit-ish volume: many small
    triangles spread over [0, 10]^3 (mimics psdr-room scale)."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, 10, (n_tri, 3)).astype(np.float32)
    # Morton order centroids so clusters are spatially tight
    from psdr_jit_tpu.native import morton_order
    perm = np.asarray(morton_order(c), np.int32)
    c = c[perm]
    p0 = c + rng.uniform(-0.05, 0.05, (n_tri, 3)).astype(np.float32)
    e1 = rng.uniform(-0.08, 0.08, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.08, 0.08, (n_tri, 3)).astype(np.float32)
    return jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2)


def make_rays(n_ray, seed=1, coherent=False):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(0, 10, (n_ray, 3)).astype(np.float32)
    if coherent:
        rd = np.tile(np.asarray([[0.3, 0.2, 0.93]], np.float32), (n_ray, 1))
    else:
        rd = rng.normal(size=(n_ray, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def make_room(n_tri, seed=0):
    """psdr-room-class scene: geometry concentrated on surfaces (6 walls +
    interior boxes tessellated into small triangles), interior empty."""
    rng = np.random.default_rng(seed)
    pts = []
    # walls of a [0,10]^3 room
    per_wall = n_tri // 12
    for axis in range(3):
        for side in (0.0, 10.0):
            uv = rng.uniform(0, 10, (per_wall * 2, 2)).astype(np.float32)
            p = np.empty((per_wall * 2, 3), np.float32)
            p[:, axis] = side
            p[:, (axis + 1) % 3] = uv[:, 0]
            p[:, (axis + 2) % 3] = uv[:, 1]
            pts.append(p)
    c = np.concatenate(pts)[:n_tri]
    n_tri = c.shape[0]  # wall partition may not divide evenly
    from psdr_jit_tpu.native import morton_order
    perm = np.asarray(morton_order(c), np.int32)
    c = c[perm]
    p0 = c
    e1 = rng.uniform(-0.08, 0.08, (n_tri, 3)).astype(np.float32)
    e2 = rng.uniform(-0.08, 0.08, (n_tri, 3)).astype(np.float32)
    return jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2)


def make_bounce_rays(n_ray, seed=1):
    """Secondary-bounce-like rays: origins ON the walls, cosine-ish
    directions into the room — the realistic incoherent workload."""
    rng = np.random.default_rng(seed)
    n6 = n_ray // 6 + 1
    ro, rd = [], []
    for axis in range(3):
        for side, sgn in ((0.05, 1.0), (9.95, -1.0)):
            p = np.empty((n6, 3), np.float32)
            p[:, axis] = side
            p[:, (axis + 1) % 3] = rng.uniform(0, 10, n6)
            p[:, (axis + 2) % 3] = rng.uniform(0, 10, n6)
            d = rng.normal(size=(n6, 3)).astype(np.float32)
            d[:, axis] = sgn * np.abs(d[:, axis])
            ro.append(p); rd.append(d)
    ro = np.concatenate(ro)[:n_ray]
    rd = np.concatenate(rd)[:n_ray]
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    sh = rng.permutation(n_ray)  # shuffle so arrival order is incoherent
    return jnp.asarray(ro[sh]), jnp.asarray(rd[sh])


def dense_path(p0, e1, e2, ro, rd):
    """The pre-BVH dense streaming kernel, regardless of triangle count."""
    f = p0.shape[0]
    n = ro.shape[0]
    f_pad = -(-f // SUPER_TRIS) * SUPER_TRIS
    pad = f_pad - f
    p0p = jnp.concatenate([p0, jnp.zeros((pad, 3), p0.dtype)])
    e1p = jnp.concatenate([e1, jnp.zeros((pad, 3), e1.dtype)])
    e2p = jnp.concatenate([e2, jnp.zeros((pad, 3), e2.dtype)])
    tile = R_ROWS_SMALL * LANES
    n_pad = -(-n // tile) * tile

    def pad_ray(x, fill):
        if n_pad != n:
            x = jnp.concatenate([x, jnp.full((n_pad - n,), fill, x.dtype)])
        return x.reshape(n_pad // LANES, LANES)

    ray_comps = [pad_ray(ro[:, i], 0.0) for i in range(3)] + [
        pad_ray(rd[:, i], 1.0) for i in range(3)
    ]
    n_super = f_pad // SUPER_TRIS
    packed = jnp.concatenate([p0p.T, e1p.T, e2p.T], axis=0)
    tri_s = jnp.transpose(packed.reshape(9, n_super, SUPER_TRIS), (1, 0, 2))
    nc = f_pad // 64
    v0 = p0p.reshape(nc, 64, 3)
    v1 = (p0p + e1p).reshape(nc, 64, 3)
    v2 = (p0p + e2p).reshape(nc, 64, 3)
    lo = jnp.minimum(jnp.minimum(v0.min(1), v1.min(1)), v2.min(1))
    hi = jnp.maximum(jnp.maximum(v0.max(1), v1.max(1)), v2.max(1))
    boxes = jnp.concatenate([lo.T, hi.T], axis=0)
    boxes_s = jnp.transpose(
        boxes.reshape(6, n_super, SUPER_TRIS // 64), (1, 0, 2)
    )
    out_t, out_id, out_u, out_v = _call_super(
        f_pad, n_pad, tri_s, boxes_s, ray_comps, False
    )
    return out_id.reshape(-1)[:n], out_t.reshape(-1)[:n]


def bench(fn, *args, n_iter=3):
    out = fn(*args)
    s = float(out[0].sum())  # force
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
        s = float(out[0].sum())
    return (time.perf_counter() - t0) / n_iter, out


def main():
    cases = []
    p0, e1, e2 = make_scene(N_TRI)
    for label, coherent in (("cloud-incoherent", False), ("cloud-coherent", True)):
        ro, rd = make_rays(N_RAY, coherent=coherent)
        cases.append((label, (p0, e1, e2), (ro, rd)))
    rp0, re1, re2 = make_room(N_TRI)
    bro, brd = make_bounce_rays(N_RAY)
    cases.append(("room-bounce", (rp0, re1, re2), (bro, brd)))
    for label, (p0, e1, e2), (ro, rd) in cases:

        jf = jax.jit(lambda *a: ray_intersect_bvh(*a))
        dt_bvh, out_bvh = bench(jf, p0, e1, e2, ro, rd)
        print(f"[{label}] bvh  : {dt_bvh * 1e3:9.1f} ms  "
              f"{N_RAY / dt_bvh / 1e6:8.2f} Mrays/s", flush=True)

        jd = jax.jit(dense_path)
        dt_dense, out_dense = bench(jd, p0, e1, e2, ro, rd)
        print(f"[{label}] dense: {dt_dense * 1e3:9.1f} ms  "
              f"{N_RAY / dt_dense / 1e6:8.2f} Mrays/s  "
              f"speedup {dt_dense / dt_bvh:.1f}x", flush=True)

        # agreement (t values; ids can differ on f32 ties)
        tb = np.asarray(out_bvh[3])
        td = np.asarray(out_dense[1])
        ib = np.asarray(out_bvh[0])
        idn = np.asarray(out_dense[0])
        miss_match = (ib >= 0) == (idn >= 0)
        print(f"[{label}] hit/miss agree: {miss_match.mean():.6f}")
        hit = (ib >= 0) & (idn >= 0)
        dt_rel = np.abs(tb[hit] - td[hit]) / np.maximum(td[hit], 1e-6)
        print(f"[{label}] t agree (rel<1e-3): {(dt_rel < 1e-3).mean():.6f}",
              flush=True)


if __name__ == "__main__":
    main()
