"""Interleaved same-process A/B over integrator tuning knobs.

Fresh-process timings scatter over a 60-90 ms machine-state band
(CLAUDE.md), so every knob decision must come from THIS harness: compile
all variants once, then alternate timed blocks.

Usage: nohup python -u scripts/ab_knobs.py > /tmp/ab_knobs.log 2>&1 &
Edit VARIANTS below (module attributes are patched before each compile and
read at trace time).
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
import psdr_jit_tpu.integrator.base as base
from scenes import make_cbox

# (name, {module attr: value})
VARIANTS = [
    ("base_96k_32k", {}),
    ("chunks_80k_32k", {"CHUNK_LANES": 81920}),
    ("chunks_112k_32k", {"CHUNK_LANES": 114688}),
    ("edge_48k", {"EDGE_CHUNK_LANES": 49152}),
]

REPS = int(os.environ.get("AB_REPS", "4"))
ITERS = int(os.environ.get("AB_ITERS", "3"))


def main():
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

    p0 = (jnp.zeros_like(bv), jnp.zeros_like(br))
    rays = 512 * 512 * (32 * 7 + 32 * 2 * 7 + 32 * 3)
    defaults = {k: getattr(base, k)
                for _, kv in VARIANTS for k in kv}

    fns = {}
    for name, kv in VARIANTS:
        for k, v in {**defaults, **kv}.items():
            setattr(base, k, v)

        def step(p, s, tgt, _integ=integ):
            def ploss(rows, pix):
                return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
            return _integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

        fn = jax.jit(step)
        float(jax.tree_util.tree_leaves(fn(p0, jnp.uint32(0), target))[0].sum())
        fns[name] = fn
        print("compiled", name, flush=True)
    for k, v in defaults.items():
        setattr(base, k, v)

    acc = {n: [] for n in fns}
    for rep in range(REPS):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            for i in range(ITERS):
                float(jax.tree_util.tree_leaves(
                    fn(p0, jnp.uint32(rep * 31 + i + 1), target)
                )[0].sum())
            acc[name].append((time.perf_counter() - t0) / ITERS)
    for name, ts in acc.items():
        ms = [1e3 * t for t in ts]
        print(f"{name}: min {min(ms):.1f} / mean {sum(ms)/len(ms):.1f} "
              f"ms/step ({rays/min(ms)/1e3:.1f} Mrays/s at min)  "
              f"reps={['%.1f' % x for x in ms]}", flush=True)


if __name__ == "__main__":
    main()
