"""Interleaved sweep of BVH granularity knobs on the envmap fused step
(BASELINE #3: 128x128 Microfacet bunny, 4968 tris, spp=sppe=sppse=32,
depth 1, 3D-guided SE).

Round-3 left ~247 ms/step of BVH sweeps: at 10 super-blocks of 512 the
per-tile culling fetches most of the bunny for semi-coherent rays.
Smaller blocks / clusters / tiles cull tighter at more grid-step and
fetch-list overhead — which way the trade goes is measured, not argued.
Variants monkeypatch ops.bvh module constants (read at trace time) and
compile in ONE process, alternating timed blocks (CLAUDE.md methodology).

Run alone: nohup python -u scripts/envmap_bvh_ab.py > /tmp/envmap_bvh_ab.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import bvh
from scenes import make_bunny_envmap

RES, SPP, SPPE, SPPSE = 128, 32, 32, 32

sc = make_bunny_envmap(width=RES, height=RES, spp=SPP, sppe=SPPE,
                       sppse=SPPSE)
sc.configure()
integ = psdr.PathTracer(max_depth=1)
t0 = time.perf_counter()
integ.preprocess_secondary_edges(sc, 0, [2000, 5, 5, 32], 1)
jax.block_until_ready(integ.warpper[0].distrb.cdf)
print(f"guiding preprocess {time.perf_counter()-t0:.1f}s", flush=True)

mesh = sc.meshes[0]
em = sc.emitter_env
bv, br = mesh.vertex_positions_raw, em.radiance
target = jnp.asarray(
    np.random.default_rng(0).random((RES * RES, 3)), jnp.float32)


def apply(p):
    dv, dr = p
    mesh.vertex_positions_raw = bv + dv
    em.radiance = jax.tree_util.tree_map(jnp.add, br, dr)


p0 = (jnp.zeros_like(bv), jax.tree_util.tree_map(jnp.zeros_like, br))
rays = RES * RES * (SPP * 3 + SPPE * 2 * 3 + SPPSE * 3)

# (TILE_ROWS, SUPER, CLUSTER)
VARIANTS = [
    (64, 512, 64),   # shipping config
    (32, 512, 64),
    (64, 256, 64),
    (64, 256, 32),
]

from psdr_jit_tpu.ops import intersect_pallas as ip

# ray_intersect_bvh / ray_intersect_pallas are themselves jitted: their
# jaxpr caches are keyed on (shapes, statics) only, so a module-knob
# change would silently serve the FIRST variant's trace (found
# 2026-08-20).  Re-wrap per variant => fresh inner caches; the callers
# import them late (module attribute lookup), so patching sticks.
BVH_IMPL = bvh.ray_intersect_bvh.__wrapped__
IP_IMPL = ip.ray_intersect_pallas.__wrapped__

def refresh_inner_jits():
    bvh.ray_intersect_bvh = jax.jit(
        BVH_IMPL, static_argnames=("interpret", "sort"))
    ip.ray_intersect_pallas = jax.jit(
        IP_IMPL, static_argnames=("interpret",))

fns, loss0 = {}, {}
for tr, su, cl in VARIANTS:
    bvh.TILE_ROWS, bvh.SUPER, bvh.CLUSTER = tr, su, cl
    refresh_inner_jits()

    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        # explicit warp: deliberate fixed-table bake for this A/B
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s,
                                    warp=_integ.warpper.get(0))[:2]

    fn = jax.jit(step)
    t0 = time.perf_counter()
    try:
        out = fn(p0, jnp.uint32(0), target)
        loss0[(tr, su, cl)] = float(out[0])
    except Exception as e:  # noqa: BLE001 — one bad variant must not
        print(f"variant tile={tr} super={su} cluster={cl} FAILED: {e}",
              flush=True)          # kill the whole timing run
        continue
    print(f"compiled tile={tr} super={su} cluster={cl} in "
          f"{time.perf_counter()-t0:.0f}s  loss={loss0[(tr, su, cl)]:.4f}",
          flush=True)
    fns[(tr, su, cl)] = fn
bvh.TILE_ROWS, bvh.SUPER, bvh.CLUSTER = 64, 512, 64

ref = list(loss0.values())[0]
for k, v in loss0.items():
    assert abs(v - ref) / abs(ref) < 1e-3, (k, v, ref)

acc = {k: [] for k in fns}
for rep in range(4):
    for key, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(jax.tree_util.tree_leaves(
                fn(p0, jnp.uint32(rep*13+i+1), target))[0].sum())
        acc[key].append((time.perf_counter() - t0) / 3)
    print({f"{k}": f"{1e3*v[-1]:.0f}ms" for k, v in acc.items()}, flush=True)

for key, v in acc.items():
    v = np.asarray(v)
    print(f"tile={key[0]} super={key[1]} cluster={key[2]}: "
          f"mean {1e3*v.mean():.1f} ms/step  min {1e3*v.min():.1f}  "
          f"-> {rays/v.min()/1e6:.2f} Mrays/s", flush=True)
