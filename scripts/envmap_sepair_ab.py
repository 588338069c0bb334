"""Interleaved A/B: PSDR_SE_PAIR on the envmap fused step (BASELINE #3).

eval_secondary_edge makes two geometrically independent detached BVH
intersections per lane (p0 -> emitter visibility, p0 -> receiver); pairing
them into ONE double-width call amortizes the per-call sort/cull/fetch
machinery exactly like the PE pair batching (which measured 419 -> 405
ms/step here).  PE stacking is pinned ON in both variants so this isolates
the SE increment.

Run alone: nohup python -u scripts/envmap_sepair_ab.py > /tmp/envmap_sepair_ab.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.integrator import base as ibase
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

ibase._PE_STACK = True
VARIANTS = [False, True]

fns, loss0 = {}, {}
for pair in VARIANTS:
    ibase._SE_PAIR = pair

    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        # explicit warp: deliberate fixed-table bake for this A/B
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s,
                                    warp=_integ.warpper.get(0))[:2]

    fn = jax.jit(step)
    t0 = time.perf_counter()
    out = fn(p0, jnp.uint32(0), target)
    loss0[pair] = float(out[0])
    print(f"compiled se_pair={pair} in {time.perf_counter()-t0:.0f}s  "
          f"loss={loss0[pair]:.4f}", flush=True)
    fns[pair] = fn
ibase._SE_PAIR = None
ibase._PE_STACK = None

# identical math up to ULP fusion-tiling shifts (rare grazing flips)
ref = loss0[False]
assert abs(loss0[True] - ref) / abs(ref) < 0.02, loss0

acc = {k: [] for k in fns}
for rep in range(4):
    for key, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(jax.tree_util.tree_leaves(
                fn(p0, jnp.uint32(rep * 13 + i + 1), target))[0].sum())
        acc[key].append((time.perf_counter() - t0) / 3)
    print({k: f"{1e3*v[-1]:.0f}ms" for k, v in acc.items()}, flush=True)

for key, v in acc.items():
    v = np.asarray(v)
    print(f"se_pair={key}: mean {1e3*v.mean():.1f} ms/step  "
          f"min {1e3*v.min():.1f}  -> {rays/v.min()/1e6:.2f} Mrays/s",
          flush=True)
