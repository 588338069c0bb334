"""Interleaved A/B: shade-megakernel hit-row packing, cat vs split.

The r5 device profile decoded ~74 ms/step of XLA machinery around the
attached interior megakernel; the seven 12.9 MB concat copies + slices +
backward mirrors belong to the "cat" packing (one concatenated gather +
per-hit concat(id,u,v)).  "split" feeds per-hit (30, rows, LANES) gather
outputs directly with id/u/v as separate tiles (ops/shade_mega.SHADE_PACK).

Run: nohup python -u scripts/shade_pack_ab.py > /tmp/shade_pack_ab.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import shade_mega
from scenes import make_cbox


def force(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


def build(pack, rows=16):
    shade_mega.SHADE_PACK = pack
    shade_mega.R_ROWS_SHADE = rows
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
    t0 = time.perf_counter()
    out = fn(p0, jnp.uint32(0), target)
    loss0 = float(out[0])
    g0 = [np.asarray(g) for g in jax.tree_util.tree_leaves(out[1])]
    print(f"{pack}: compiled {time.perf_counter()-t0:.1f} s "
          f"loss {loss0:.4f}", flush=True)
    return (lambda i: force(fn(p0, jnp.uint32(i), target))), loss0, g0


def main():
    import os
    variants = os.environ.get("AB_VARIANTS", "cat/16,split/16").split(",")
    fns, losses, grads = {}, {}, {}
    for v in variants:
        pack, rows = v.split("/")
        fns[v], losses[v], grads[v] = build(pack, int(rows))
    base = variants[0]
    for v in variants[1:]:
        rel = abs(losses[v] - losses[base]) / (abs(losses[base]) + 1e-12)
        grel = max(
            float(np.abs(a - b).sum() / (np.abs(a).sum() + 1e-12))
            for a, b in zip(grads[base], grads[v])
        )
        print(f"loss rel {v} vs {base}: {rel:.2e}  grad rel: {grel:.2e}",
              flush=True)

    for f, *_ in [(fns[p],) for p in fns]:
        pass
    for p, f in fns.items():
        for i in range(2):
            f(i + 1)
    res = {p: [] for p in fns}
    iters = 3
    for blk in range(5):
        for p, f in fns.items():
            t0 = time.perf_counter()
            for i in range(iters):
                f(blk * iters + i + 10)
            res[p].append((time.perf_counter() - t0) / iters)
    for p, ts in res.items():
        ms = [1e3 * t for t in ts]
        print(f"{p}: mean {sum(ms)/len(ms):.1f} ms  min {min(ms):.1f}  "
              f"all {[round(m, 1) for m in ms]}", flush=True)
    shade_mega.SHADE_PACK = "split"


if __name__ == "__main__":
    main()
