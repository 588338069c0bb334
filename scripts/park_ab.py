"""Interleaved A/B: dead-lane parking (the TPU wavefront-compaction
equivalent) ON vs OFF, on the two BVH workloads (VERDICT r4 #2).

Per-bounce wavefront compaction/re-sort on this design decomposes into:
  (a) re-sort: ray_intersect_bvh re-sorts its input every call, so tiles
      are re-formed from the CURRENT bounce's directions already;
  (b) compaction of dead lanes: parking (ops/bvh.py PARK_DEAD) moves dead
      lanes to self-culling tiles, which removes their sweep cost — the
      only part physical compaction could also remove (dead-lane SHADING
      is masked ALU, bounded by the measured live fractions,
      scripts/live_fraction.py).

PARK_DEAD is a module constant read at TRACE time, so the A/B flips it
between jit compiles of separate integrator instances and interleaves
timed blocks in ONE process (the only valid A/B methodology, CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import bvh
from scenes import make_gallery, make_bunny_envmap


def force(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


def build_gallery(park: bool):
    bvh.PARK_DEAD = park
    sc = make_gallery(width=256, height=256, spp=4, n_spheres=80, subdiv=3)
    sc.configure()
    integ = psdr.PathTracer(max_depth=2)
    sd = jax.lax.stop_gradient(sc.data)
    fn = jax.jit(lambda s: integ.render_impl(sd, sc.opts, 0, s, None, "C"))
    force(fn(jnp.uint32(0)))
    return lambda i: force(fn(jnp.uint32(i)))


def build_envmap(park: bool):
    bvh.PARK_DEAD = park
    sc = make_bunny_envmap(width=128, height=128, spp=32, sppe=32, sppse=32)
    sc.configure()
    integ = psdr.PathTracer(max_depth=1)
    integ.preprocess_secondary_edges(sc, 0, [2000, 5, 5, 32], 1)
    mesh, em = sc.meshes[0], sc.emitter_env
    bv, br = mesh.vertex_positions_raw, em.radiance
    target = jnp.zeros((128 * 128, 3), jnp.float32)

    def apply(p):
        dv, dr = p
        mesh.vertex_positions_raw = bv + dv
        em.radiance = jax.tree_util.tree_map(jnp.add, br, dr)

    def step(p, s):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - target[pix]), axis=-1)
        return integ.loss_and_grad(sc, p, apply, ploss, seed=s,
                                   warp=integ.warpper.get(0))[:2]

    fn = jax.jit(step)
    p0 = (jnp.zeros_like(bv), jax.tree_util.tree_map(jnp.zeros_like, br))
    force(fn(p0, jnp.uint32(0)))
    return lambda i: force(fn(p0, jnp.uint32(i)))


def interleave(fns, n_blocks=5, iters=3, warm=2):
    for name, f in fns.items():
        for i in range(warm):
            f(i + 1)
    res = {k: [] for k in fns}
    for blk in range(n_blocks):
        for name, f in fns.items():
            t0 = time.perf_counter()
            for i in range(iters):
                f(blk * iters + i + 10)
            res[name].append((time.perf_counter() - t0) / iters)
    for name, ts in res.items():
        ms = [1e3 * t for t in ts]
        print(f"{name}: mean {sum(ms)/len(ms):.1f} ms  min {min(ms):.1f}  "
              f"all {[round(m, 1) for m in ms]}", flush=True)


def main():
    which = os.environ.get("AB_WHICH", "gallery")
    if which == "gallery":
        print("== gallery 256x256 spp4 depth2 renderC ==", flush=True)
        fns = {
            "park_on": build_gallery(True),
            "park_off": build_gallery(False),
        }
    else:
        print("== envmap fused step ==", flush=True)
        fns = {
            "park_on": build_envmap(True),
            "park_off": build_envmap(False),
        }
    bvh.PARK_DEAD = True
    interleave(fns)


if __name__ == "__main__":
    main()
