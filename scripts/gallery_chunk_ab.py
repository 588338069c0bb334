"""Forward-only interior chunk sweep on a 512-squared gallery renderC.

The 256k BVH interior routing (integrator/base.interior_chunk_lanes,
2026-08-20) dropped the 256-squared gallery frame 956 -> 802.5 ms by
collapsing it to ONE chunk.  renderC has no reverse-AD working set, so
larger frames (512-squared, 1M lanes) might want even bigger forward
chunks; the counterweight is XLA fusion quality on multi-million-lane
graphs (base.py CHUNK_LANES note).  Interleaved A/B at 256k/512k/1M.

Run: nohup python -u scripts/gallery_chunk_ab.py > /tmp/gal_chunk.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import psdr_jit_tpu as psdr
from psdr_jit_tpu.integrator import base as ibase
from scenes import make_gallery

RES, SPP, DEPTH = 512, 4, 2

sc = make_gallery(width=RES, height=RES, spp=SPP)
sc.configure()
rays = RES * RES * SPP * (1 + 2 * DEPTH)

fns = {}
for ic in (256 * 1024, 512 * 1024, 1024 * 1024):
    ibase.CHUNK_LANES_BVH = ic
    integ = psdr.PathTracer(max_depth=DEPTH)  # fresh _get_jit cache

    def render(s, _i=integ):
        return _i.renderC(sc, 0, seed=s)

    fn = jax.jit(render)
    t0 = time.perf_counter()
    img0 = np.asarray(fn(jnp.uint32(0)))
    print(f"compiled ic={ic//1024}k in {time.perf_counter()-t0:.0f}s "
          f"sum={img0.sum():.3f}", flush=True)
    fns[ic] = fn
ibase.CHUNK_LANES_BVH = 256 * 1024

acc = {k: [] for k in fns}
for rep in range(4):
    for ic, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(2):
            float(fn(jnp.uint32(rep * 7 + i + 1)).sum())
        acc[ic].append((time.perf_counter() - t0) / 2)
    print({f"{k//1024}k": f"{1e3*v[-1]:.0f}ms" for k, v in acc.items()},
          flush=True)
for ic, v in acc.items():
    v = np.asarray(v)
    print(f"ic={ic//1024}k: mean {1e3*v.mean():.1f} ms/frame  min "
          f"{1e3*v.min():.1f}  -> {rays/v.min()/1e6:.2f} Mrays/s", flush=True)
