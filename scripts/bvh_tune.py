"""Interleaved tune of the BVH kernel geometry on the 102k-tri gallery
frame: super-block size (cull/DMA granularity), in-kernel cluster size,
and tile rows (rays per cull decision).

The gallery profile shows ~90% of the frame in live-incoherent sweeps —
the lever left is how finely blocks are culled per tile.  Smaller SUPER
doubles the fetch-list width and DMA step count but halves the triangles
swept per false-positive visit; smaller TILE_ROWS tightens tile hulls at
more grid steps.

Run alone: nohup python -u scripts/bvh_tune.py > /tmp/bvh_tune.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import bvh
from scenes import make_gallery

RES, SPP, DEPTH = 256, 4, 2

sc = make_gallery(width=RES, height=RES, spp=SPP)
sc.configure()
sd = jax.lax.stop_gradient(sc.data)
n_tris = sum(m.num_faces for m in sc.meshes)
rays = RES * RES * SPP * (1 + 2 * DEPTH)
print(f"gallery: {n_tris} tris, {rays/1e6:.1f} Mrays/frame", flush=True)

# (SUPER, CLUSTER, TILE_ROWS)
VARIANTS = {
    "512/64/64 (base)": (512, 64, 64),
    "256/64/64": (256, 64, 64),
    "256/32/64": (256, 32, 64),
    "512/32/64": (512, 32, 64),
    "512/64/32": (512, 64, 32),
    "256/32/32": (256, 32, 32),
}

fns = {}
img0 = None
for name, (sup, clus, rows) in VARIANTS.items():
    bvh.SUPER, bvh.CLUSTER, bvh.TILE_ROWS = sup, clus, rows
    bvh.ray_intersect_bvh.clear_cache()

    def fwd(sd_, s, _integ=psdr.PathTracer(max_depth=DEPTH)):
        return _integ.render_impl(sd_, sc.opts, 0, s, None, "C")

    fn = jax.jit(fwd)
    t0 = time.perf_counter()
    try:
        img = fn(sd, jnp.uint32(0))
        float(img.sum())
    except Exception as e:  # noqa: BLE001 - report compile failures, keep going
        print(f"variant {name!r} FAILED: {type(e).__name__}: {e}",
              flush=True)
        continue
    print(f"compiled {name!r} in {time.perf_counter()-t0:.0f}s", flush=True)
    if img0 is None:
        img0 = np.asarray(img)
    else:
        d = np.abs(np.asarray(img) - img0).mean()
        print(f"  mean|diff| vs base: {d:.2e}", flush=True)
    fns[name] = fn
bvh.SUPER, bvh.CLUSTER, bvh.TILE_ROWS = 512, 64, 64
bvh.ray_intersect_bvh.clear_cache()

acc = {m: [] for m in fns}
for rep in range(3):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(2):
            float(fn(sd, jnp.uint32(rep * 13 + i + 1)).sum())
        acc[name].append((time.perf_counter() - t0) / 2)

for name, ts in acc.items():
    ms = [1e3 * t for t in ts]
    print(f"{name:18s}: {min(ms):7.1f} min / {sum(ms)/len(ms):7.1f} mean "
          f"ms/frame ({rays/min(ms)/1e3:6.1f} Mrays/s)  "
          f"reps={['%.0f' % x for x in ms]}")
