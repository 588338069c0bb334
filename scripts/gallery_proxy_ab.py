"""Interleaved A/B: guaranteed-occluder proxy t-bound pre-pass
(PSDR_BVH_PROXY) on the 102k-tri gallery renderC (256x256 spp=4 depth=2).

The round-3 refutations covered in-kernel levers (front-to-back
early-out, dead-lane parking) — this is the remaining CLAUDE.md lever:
a cheap dense sweep of the N largest-area triangles (room walls/floor)
gives every ray a REAL hit upper bound, which (a) pre-initializes the
closest-hit state and (b) drops blocks entering beyond every lane's
bound from the fetch list in XLA — cutting DMA and grid steps, which
the in-kernel early-out (post-DMA, ALU-only) could not.

Fresh inner-jit wrappers per variant (ray_intersect_bvh's jaxpr cache
ignores module knobs — 2026-08-20).

Run alone: nohup python -u scripts/gallery_proxy_ab.py > /tmp/gallery_proxy_ab.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import bvh, intersect_pallas as ip
from scenes import make_gallery

RES, SPP, DEPTH = 256, 4, 2

sc = make_gallery(width=RES, height=RES, spp=SPP)
sc.configure()
integ = psdr.PathTracer(max_depth=DEPTH)
sd = jax.lax.stop_gradient(sc.data)
rays = RES * RES * SPP * (1 + 2 * DEPTH)
n_tris = sum(m.num_faces for m in sc.meshes)
print(f"{n_tris} tris", flush=True)

BVH_IMPL = bvh.ray_intersect_bvh.__wrapped__
IP_IMPL = ip.ray_intersect_pallas.__wrapped__


def refresh_inner_jits():
    bvh.ray_intersect_bvh = jax.jit(
        BVH_IMPL, static_argnames=("interpret", "sort"))
    ip.ray_intersect_pallas = jax.jit(
        IP_IMPL, static_argnames=("interpret",))


VARIANTS = [0, 64, 256]   # proxy triangle counts

fns, img0 = {}, {}
for pr in VARIANTS:
    bvh.PROXY_TRIS = pr
    refresh_inner_jits()

    def fwd(sd_, s, _integ=integ):
        return _integ.render_impl(sd_, sc.opts, 0, s, None, "C")

    fn = jax.jit(fwd)
    t0 = time.perf_counter()
    out = np.asarray(fn(sd, jnp.uint32(0)))
    print(f"compiled proxy={pr} in {time.perf_counter()-t0:.0f}s  "
          f"mean={out.mean():.6f}", flush=True)
    fns[pr] = fn
    img0[pr] = out
bvh.PROXY_TRIS = 0

ref = img0[VARIANTS[0]]
for k, v in img0.items():
    rel = np.abs(v - ref).sum() / (np.abs(ref).sum() + 1e-12)
    print(f"proxy={k}: image rel vs proxy=0: {rel:.2e}", flush=True)

acc = {k: [] for k in fns}
for rep in range(4):
    for key, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(fn(sd, jnp.uint32(rep * 7 + i + 1)).sum())
        acc[key].append((time.perf_counter() - t0) / 3)
    print({k: f"{1e3*v[-1]:.0f}ms" for k, v in acc.items()}, flush=True)

for key, v in acc.items():
    v = np.asarray(v)
    print(f"proxy={key}: mean {1e3*v.mean():.1f} ms/frame  "
          f"min {1e3*v.min():.1f}  -> {rays/v.min()/1e6:.2f} Mrays/s",
          flush=True)
