"""Interleaved A/B: SE-pass wavefront compaction on the cbox headline.

Variants flip three trace-time knobs (VERDICT r4 #2, dense-path flavor):
  * intersect_pallas.R_ROWS_SMALL — kernel tile rays (tile = rows*128);
    finer tiles give the cluster-cull finer skip granularity,
  * intersect_pallas.DENSE_PARK — park dead lanes outside the scene,
  * base._SE_SORT — liveness-sort SE lanes before the body (bss probe).

On the fused cbox step the interior + PE passes are megakernelized, so
the dense intersect kernels run ONLY in the SE pass (3 intersects over
8.4M lanes at 57% bss-validity) — any delta here is the SE compaction.

ray_intersect_pallas is a module-level jit whose cache would silently
replay the first variant's trace; each variant clears it before compiling
(same staleness class as bench._parity_gate's fresh-integrator note).

Run: nohup python -u scripts/rrows_ab.py > /tmp/rrows_ab.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import intersect_pallas
from psdr_jit_tpu.integrator import base as ibase
from scenes import make_cbox

import os as _os
_vs = _os.environ.get(
    "AB_VARIANTS",
    "base_256/256/0/0,sort_256/256/1/1,sort_64/64/1/1,sort_32/32/1/1,"
    "nosort_64/64/0/0")
VARIANTS = [
    (p.split("/")[0], int(p.split("/")[1]), p.split("/")[2] == "1",
     p.split("/")[3] == "1")
    for p in _vs.split(",")
]


def force(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


def build(rows, sort, park):
    intersect_pallas.R_ROWS_SMALL = rows
    intersect_pallas.DENSE_PARK = park
    ibase._SE_SORT = sort
    intersect_pallas.ray_intersect_pallas.clear_cache()

    sc = make_cbox(width=512, height=512, spp=32, sppe=32, sppse=32)
    sc.configure()
    integ = psdr.PathTracer(max_depth=3)
    mesh, em = sc.meshes[-1], sc.emitters[0]
    bv, br = mesh.vertex_positions_raw, em.radiance
    target = jnp.asarray(
        np.random.default_rng(0).random((512 * 512, 3)), jnp.float32
    )

    def apply(p):
        dv, dr = p
        mesh.vertex_positions_raw = bv + dv
        em.radiance = br + dr

    def step(p, s, tgt):
        def ploss(rows_, pix):
            return jnp.sum(jnp.square(rows_ - tgt[pix]), axis=-1)
        return integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

    fn = jax.jit(step)
    p0 = (jnp.zeros_like(bv), jnp.zeros_like(br))
    out = fn(p0, jnp.uint32(0), target)
    loss0 = float(out[0])
    force(out)
    return (lambda i: force(fn(p0, jnp.uint32(i), target))), loss0


def main():
    fns = {}
    losses = {}
    for name, rows, sort, park in VARIANTS:
        t0 = time.perf_counter()
        fns[name], losses[name] = build(rows, sort, park)
        print(f"{name}: compiled {time.perf_counter()-t0:.1f} s  "
              f"loss(seed0) {losses[name]:.4f}", flush=True)
    # estimator check: same seed -> losses must agree across variants
    base_l = losses[VARIANTS[0][0]]
    for name, l in losses.items():
        rel = abs(l - base_l) / (abs(base_l) + 1e-12)
        print(f"  loss rel vs base: {name} {rel:.2e}", flush=True)

    for name, f in fns.items():
        for i in range(2):
            f(i + 1)
    res = {k: [] for k in fns}
    iters = 3
    for blk in range(5):
        for name, f in fns.items():
            t0 = time.perf_counter()
            for i in range(iters):
                f(blk * iters + i + 10)
            res[name].append((time.perf_counter() - t0) / iters)
    for name, ts in res.items():
        ms = [1e3 * t for t in ts]
        print(f"{name}: mean {sum(ms)/len(ms):.1f} ms  min {min(ms):.1f}  "
              f"all {[round(m, 1) for m in ms]}", flush=True)

    intersect_pallas.R_ROWS_SMALL = 256
    intersect_pallas.DENSE_PARK = True
    ibase._SE_SORT = None


if __name__ == "__main__":
    main()
