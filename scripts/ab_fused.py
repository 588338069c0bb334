"""Time the fused full-term training step (bench.py headline workload)
under the current env (PSDR_SPLAT_T, PSDR_REMAT, ...).

Run alone: PSDR_SPLAT_T=planar nohup python -u scripts/ab_fused.py > log &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from scenes import make_cbox

WIDTH = HEIGHT = 512
SPP = SPPE = SPPSE = 32
DEPTH = 3
N_ITER = int(os.environ.get("AB_ITERS", "5"))


def main():
    sc = make_cbox(width=WIDTH, height=HEIGHT, spp=SPP, sppe=SPPE,
                   sppse=SPPSE)
    sc.configure()
    integ = psdr.PathTracer(max_depth=DEPTH)
    mesh = sc.meshes[-1]
    em = sc.emitters[0]
    bv, br = mesh.vertex_positions_raw, em.radiance
    import numpy as _np
    target = jnp.asarray(
        _np.random.default_rng(0).random((WIDTH * HEIGHT, 3)), jnp.float32
    )

    def apply(p):
        dv, dr = p
        mesh.vertex_positions_raw = bv + dv
        em.radiance = br + dr

    p0 = (jnp.zeros_like(bv), jnp.zeros_like(br))

    def force(tree):
        return jax.tree_util.tree_map(lambda x: float(x.sum()), tree)

    rays = WIDTH * HEIGHT * (
        SPP * (1 + 2 * DEPTH) + SPPE * 2 * (1 + 2 * DEPTH) + SPPSE * 3
    )
    import psdr_jit_tpu.ops.image as im

    for variant in os.environ.get("AB_VARIANTS", "rows,planar,lane").split(","):
        im.SPLAT_TRANSPOSE = variant

        # a fresh function object per variant, so jit's cache cannot reuse
        # the previous variant's executable
        def step(p, s, tgt):
            def ploss(rows, pix):
                return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
            return integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

        fn = jax.jit(step)
        force(fn(p0, jnp.uint32(0), target))
        print(f"compiled {variant}", flush=True)
        t0 = time.perf_counter()
        for i in range(N_ITER):
            force(fn(p0, jnp.uint32(i + 1), target))
        dt = (time.perf_counter() - t0) / N_ITER
        print(f"PSDR_SPLAT_T={variant}  {1e3 * dt:.1f} ms/step  "
              f"{rays / dt / 1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
