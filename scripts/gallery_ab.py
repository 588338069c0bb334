"""Interleaved same-process A/B of the two round-3 BVH levers on the
100k-triangle gallery render (end-to-end, renderC 256x256 spp=4 depth=2):

* front-to-back early-out (tnear slot skip, ops/bvh.py kernel)
* dead-lane parking (tile-level wavefront compaction via `active`)

The knobs are module globals read at TRACE time; `ray_intersect_bvh` is a
nested jit, so its trace cache must be cleared between variants or the
outer jit would reuse the previous variant's jaxpr.

Methodology per CLAUDE.md: compile all variants once, alternate timed
blocks.  Run alone:
    nohup python -u scripts/gallery_ab.py > /tmp/gallery_ab.log 2>&1 &
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
integ = psdr.PathTracer(max_depth=DEPTH)
sd = jax.lax.stop_gradient(sc.data)
n_tris = sum(m.num_faces for m in sc.meshes)
rays = RES * RES * SPP * (1 + 2 * DEPTH)
print(f"gallery: {n_tris} tris, {rays/1e6:.1f} Mrays/frame", flush=True)

VARIANTS = {
    "park+eo": (True, True),
    "eo only": (False, True),
    "park only": (True, False),
    "neither (r2)": (False, False),
}

fns = {}
img0 = None
for name, (park, eo) in VARIANTS.items():
    bvh.PARK_DEAD, bvh.EARLY_OUT = park, eo
    bvh.ray_intersect_bvh.clear_cache()

    def fwd(sd_, s, _integ=psdr.PathTracer(max_depth=DEPTH)):
        return _integ.render_impl(sd_, sc.opts, 0, s, None, "C")

    fn = jax.jit(fwd)
    t0 = time.perf_counter()
    img = fn(sd, jnp.uint32(0))
    float(img.sum())
    print(f"compiled {name!r} in {time.perf_counter()-t0:.0f}s", flush=True)
    if img0 is None:
        img0 = np.asarray(img)
    else:
        d = np.abs(np.asarray(img) - img0).mean()
        print(f"  mean|diff| vs park+eo: {d:.2e}", flush=True)
    fns[name] = fn
bvh.PARK_DEAD = bvh.EARLY_OUT = True
bvh.ray_intersect_bvh.clear_cache()

acc = {m: [] for m in fns}
for rep in range(4):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(fn(sd, jnp.uint32(rep * 13 + i + 1)).sum())
        acc[name].append((time.perf_counter() - t0) / 3)

for name, ts in acc.items():
    ms = [1e3 * t for t in ts]
    print(f"{name:14s}: {min(ms):7.1f} min / {sum(ms)/len(ms):7.1f} mean "
          f"ms/frame ({rays/min(ms)/1e3:6.1f} Mrays/s)  "
          f"reps={['%.0f' % x for x in ms]}")
