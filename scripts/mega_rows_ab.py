"""Interleaved A/B: R_ROWS_MEGA (detached mega-Li tile rows) on the headline.

R_ROWS_MEGA (ops/megakernel.py) sets the rays-per-tile block of the
detached Li megakernel that the PE pass runs (two li_mega_pair launches,
~150 ms/step = the headline's biggest single block).  It was never swept;
the analogous dense-kernel knob R_ROWS_SMALL just won ~8 ms/step at
256 -> 64 (finer cluster-cull skip granularity + smaller VMEM working
set), and the mega kernel uses the same cluster-culled lax.cond sweeps.

li_mega / li_mega_pair / the shade-kernel wrappers are module-level jits
whose caches would replay the first variant's trace — each variant clears
them before compiling (same staleness class as rrows_ab.py).

Run: nohup python -u scripts/mega_rows_ab.py > /tmp/mega_rows_ab.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import megakernel
from scenes import make_cbox

import os as _os
_vs = _os.environ.get("AB_VARIANTS", "64,128,32,16")
VARIANTS = [int(v) for v in _vs.split(",")]


def force(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


def build(rows):
    megakernel.R_ROWS_MEGA = rows
    megakernel.li_mega.clear_cache()
    megakernel.li_mega_pair.clear_cache()

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
    for rows in VARIANTS:
        t0 = time.perf_counter()
        fns[rows], losses[rows] = build(rows)
        print(f"rows={rows}: compiled {time.perf_counter()-t0:.1f} s  "
              f"loss(seed0) {losses[rows]:.4f}", flush=True)
    base_l = losses[VARIANTS[0]]
    for rows, l in losses.items():
        rel = abs(l - base_l) / (abs(base_l) + 1e-12)
        print(f"  loss rel vs base: rows={rows} {rel:.2e}", flush=True)

    for rows, f in fns.items():
        for i in range(2):
            f(i + 1)
    res = {k: [] for k in fns}
    iters = 3
    for blk in range(5):
        for rows, f in fns.items():
            t0 = time.perf_counter()
            for i in range(iters):
                f(blk * iters + i + 10)
            res[rows].append((time.perf_counter() - t0) / iters)
    for rows, ts in res.items():
        ms = [1e3 * t for t in ts]
        print(f"rows={rows}: mean {sum(ms)/len(ms):.1f} ms  min {min(ms):.1f}  "
              f"all {[round(m, 1) for m in ms]}", flush=True)

    megakernel.R_ROWS_MEGA = 64


if __name__ == "__main__":
    main()
