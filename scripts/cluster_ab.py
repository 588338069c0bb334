"""A/B CLUSTER_SMALL granularity on the real renderC step (TPU).

cbox has 36 triangles; CLUSTER_SMALL=64 pads them to 64 — every ray pays
44% padding in the triangle loop.  Smaller clusters cut padding AND cull
finer, at the cost of more per-cluster slab tests.

Run alone: nohup python -u scripts/cluster_ab.py > /tmp/cluster_ab.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
import psdr_jit_tpu.ops.intersect_pallas as ip
from scenes import make_cbox

WIDTH = HEIGHT = 512
SPP = 32
DEPTH = 3
N_ITER = 5


def time_render(sc, integ):
    fn = jax.jit(lambda seed: integ.renderC(sc, 0, seed=seed))
    float(fn(jnp.uint32(0)).sum())
    t0 = time.perf_counter()
    for i in range(N_ITER):
        float(fn(jnp.uint32(i + 1)).sum())
    return (time.perf_counter() - t0) / N_ITER


def main():
    sc = make_cbox(width=WIDTH, height=HEIGHT, spp=SPP)
    sc.configure()
    integ = psdr.PathTracer(max_depth=DEPTH)
    n_tris = sum(m.num_faces for m in sc.meshes)
    print(f"tris={n_tris}", flush=True)
    for cluster in (64, 32, 16, 8):
        ip.CLUSTER_SMALL = cluster
        jax.clear_caches()
        dt = time_render(sc, integ)
        rays = WIDTH * HEIGHT * SPP * (1 + 2 * DEPTH)
        print(f"CLUSTER_SMALL={cluster:3d}: {1e3 * dt:7.1f} ms/step "
              f"({rays / dt / 1e6:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
