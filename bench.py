"""Benchmark: Mrays/s/chip forward+backward on the Cornell box.

Canonical workload (reference README.md:42-116 + BASELINE.json): cbox
512x512, spp=32, sppe=32, sppse=32, PathTracer(3) — one forward render +
gradient w.r.t. scene parameters (vertex positions of a block + light
radiance), i.e. the fwd+bwd step of an inverse-rendering loop with ALL
three estimators (interior + primary-edge + secondary-edge boundary terms).

Ray accounting per pixel:
  interior:   spp   * (1 + 2*depth)          camera + depth*(shadow+bounce)
  primary:    sppe  * 2 * (1 + 2*depth)      two detached Li per edge lane
  secondary:  sppse * 3                      visibility + opposite + camera

Prints ONE JSON line; headline value is the full-term throughput, the
interior-only figure (round-1 headline) is carried alongside:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N,
     "interior_only_mrays": N, "interior_vs_baseline": N}

``vs_baseline`` is vs. the speed-of-light estimate for this chip (fraction
of roofline): the reference publishes no numbers (BASELINE.md), so the
roofline is the only defensible denominator.
"""

import json
import os
import sys
import time

# The benchmark is a pure reverse-mode training step: use the custom_vjp
# path-replay backward (integrator/prb.py) — the recommended production
# config for jax.grad loops (A/B on v5e: prb 478 ms/step vs chunk-remat
# 521 ms; see integrator/base.py REMAT_MODE).  Must be set before import.
os.environ.setdefault("PSDR_REMAT", "prb")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from scenes import make_cbox

WIDTH = HEIGHT = 512
SPP = 32
SPPE = 32
SPPSE = 32
DEPTH = 3
N_ITER = 5


def _time_grad(sc, integ, n_iter=N_ITER):
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

    t0 = time.perf_counter()
    for i in range(n_iter):
        g = grad_fn(zeros_v, zeros_r, jnp.uint32(i + 1))
        g = jax.tree_util.tree_map(lambda x: float(x.sum()), g)  # force
    return (time.perf_counter() - t0) / n_iter


def main():
    n_pix = WIDTH * HEIGHT
    rays_interior = n_pix * SPP * (1 + 2 * DEPTH)
    rays_primary = n_pix * SPPE * 2 * (1 + 2 * DEPTH)
    rays_secondary = n_pix * SPPSE * 3

    # Speed-of-light estimate: intersection is the dominant unavoidable cost.
    # The cluster-brute kernel does ~F_pad triangle tests per ray at ~48
    # VPU flops each; a v5e VPU sustains ~4e12 f32 flop/s.
    # (BASELINE.json "published" is empty — no reference numbers exist.)
    sc = make_cbox(width=WIDTH, height=HEIGHT, spp=SPP)
    sc.configure()
    f_pad = 64 * -(-sum(m.num_faces for m in sc.meshes) // 64)
    vpu_flops = 4.0e12
    sol_mrays = vpu_flops / (f_pad * 48.0) / 1e6

    # interior-only (round-1 headline, kept for cross-round comparability)
    integ = psdr.PathTracer(max_depth=DEPTH)
    dt_int = _time_grad(sc, integ)
    mrays_int = rays_interior / dt_int / 1e6

    # full-term README workload
    sc_full = make_cbox(width=WIDTH, height=HEIGHT, spp=SPP,
                        sppe=SPPE, sppse=SPPSE)
    sc_full.configure()
    integ_full = psdr.PathTracer(max_depth=DEPTH)
    dt_full = _time_grad(sc_full, integ_full)
    mrays_full = (rays_interior + rays_primary + rays_secondary) / dt_full / 1e6

    print(json.dumps({
        "metric": "cbox512_spp32_sppe32_sppse32_depth3_fwdbwd",
        "value": round(mrays_full, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_full / sol_mrays, 4),
        "interior_only_mrays": round(mrays_int, 3),
        "interior_vs_baseline": round(mrays_int / sol_mrays, 4),
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
