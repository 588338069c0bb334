"""Interleaved A/B: route the 4968-tri envmap bunny through the sorted-ray
tile-culled BVH path (PSDR_BVH_MIN_TRIS=4096) vs the default dense
super-block streaming (cutoff 16384).

Post-alias-table, the envmap fused step is 1553 ms with ~600 ms in the
dense streaming sweeps (every ray sweeps all 10 super-blocks modulo
cluster culling).  Tile-level block culling may cut that for the coherent
camera/edge rays even though the scene is far below the default cutoff.

Run alone: nohup python -u scripts/envmap_ab.py > /tmp/envmap_ab.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import intersect_pallas as ip
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

VARIANTS = {"dense 16384": 16384, "bvh 4096": 4096}
fns = {}
loss0 = None
for name, cutoff in VARIANTS.items():
    ip.BVH_MIN_TRIS = cutoff
    ip.ray_intersect_pallas.clear_cache()

    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        # explicit warp: deliberate fixed-table bake for this A/B
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s,
                                    warp=_integ.warpper.get(0))[:2]

    fn = jax.jit(step)
    t0 = time.perf_counter()
    out = fn(p0, jnp.uint32(0), target)
    loss = float(jax.tree_util.tree_leaves(out)[0].sum())
    print(f"compiled {name!r} in {time.perf_counter()-t0:.0f}s "
          f"loss={loss:.6f}", flush=True)
    if loss0 is None:
        loss0 = loss
    else:
        print(f"  loss rel diff vs dense: "
              f"{abs(loss-loss0)/max(abs(loss0),1e-9):.2e}", flush=True)
    fns[name] = fn
ip.BVH_MIN_TRIS = 16384
ip.ray_intersect_pallas.clear_cache()

acc = {m: [] for m in fns}
for rep in range(4):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(2):
            float(jax.tree_util.tree_leaves(
                fn(p0, jnp.uint32(rep * 13 + i + 1), target))[0].sum())
        acc[name].append((time.perf_counter() - t0) / 2)

for name, ts in acc.items():
    ms = [1e3 * t for t in ts]
    print(f"{name:12s}: {min(ms):7.1f} min / {sum(ms)/len(ms):7.1f} mean "
          f"ms/step ({rays/min(ms)/1e3:5.1f} Mrays/s)  "
          f"reps={['%.0f' % x for x in ms]}")
