"""Benchmark: Mrays/s/chip forward+backward on the Cornell box.

Workload (BASELINE.json): cbox 512x512, spp=32, PathTracer(3), one
forward render + gradient w.r.t. scene parameters (vertex positions of a
block + light radiance) — the fwd+bwd step of an inverse-rendering loop.

Ray count per interior sample at depth D: 1 camera ray + D * (1 shadow ray +
1 bounce ray).  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

``vs_baseline`` is vs. the speed-of-light estimate for this chip (fraction of
roofline): the reference publishes no numbers (BASELINE.md), so the roofline
is the only defensible denominator.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from scenes import make_cbox

WIDTH = HEIGHT = 512
SPP = 32
DEPTH = 3
RAYS_PER_SAMPLE = 1 + 2 * DEPTH


def main():
    sc = make_cbox(width=WIDTH, height=HEIGHT, spp=SPP)
    sc.configure()
    integ = psdr.PathTracer(max_depth=DEPTH)
    mesh = sc.meshes[-1]
    em = sc.emitters[0]
    base_v = mesh.vertex_positions_raw
    base_r = em.radiance

    def loss_fn(dv, dr, seed):
        mesh.vertex_positions_raw = base_v + dv
        em.radiance = base_r + dr
        img = integ.renderD(sc, 0, seed=seed)
        return jnp.sum(jnp.square(img))

    # One fused program: the renderer chunks lanes in-jit with remat, so the
    # full-frame gradient fits on chip; the outer jit keeps the traced scene
    # compile + autodiff on-device (eager dispatch costs ~0.7 s of host
    # latency per call otherwise).
    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    zeros_v = jnp.zeros_like(base_v)
    zeros_r = jnp.zeros_like(base_r)

    # warmup/compile (forced: the remote runtime defers execution until
    # readback, so block_until_ready alone does not run the program)
    g = grad_fn(zeros_v, zeros_r, jnp.uint32(0))
    g = jax.tree_util.tree_map(lambda x: float(x.sum()), g)

    n_iter = 5
    t0 = time.perf_counter()
    for i in range(n_iter):
        g = grad_fn(zeros_v, zeros_r, jnp.uint32(i + 1))
        g = jax.tree_util.tree_map(lambda x: float(x.sum()), g)  # force
    dt = (time.perf_counter() - t0) / n_iter

    n_rays = WIDTH * HEIGHT * SPP * RAYS_PER_SAMPLE
    mrays = n_rays / dt / 1e6

    # Speed-of-light estimate: intersection is the dominant unavoidable cost.
    # The cluster-brute kernel does ~F_pad triangle tests per ray at ~48
    # VPU flops each; a v5e VPU sustains ~4e12 f32 flop/s.
    # (BASELINE.json "published" is empty — no reference numbers exist.)
    f_pad = 64 * -(-sum(m.num_faces for m in sc.meshes) // 64)
    vpu_flops = 4.0e12
    sol_mrays = vpu_flops / (f_pad * 48.0) / 1e6
    print(json.dumps({
        "metric": "cbox512_spp32_depth3_fwdbwd",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / sol_mrays, 4),
    }))


if __name__ == "__main__":
    # The remote TPU runtime occasionally drops into FAILED_PRECONDITION
    # after heavy kernel churn; a fresh attempt after a pause recovers it.
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            sys.stderr.write(f"bench attempt {attempt} failed: {e}\n")
            time.sleep(20)
