"""Interleaved same-process A/B of PSDR_GATHER=highest vs bf16x3."""
import os, sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from scenes import make_cbox

sc = make_cbox(width=512, height=512, spp=32, sppe=32, sppse=32)
sc.configure()
integ = psdr.PathTracer(max_depth=3)
mesh, em = sc.meshes[-1], sc.emitters[0]
bv, br = mesh.vertex_positions_raw, em.radiance
target = jnp.asarray(np.random.default_rng(0).random((512*512, 3)), jnp.float32)
def apply(p):
    dv, dr = p
    mesh.vertex_positions_raw = bv + dv
    em.radiance = br + dr
p0 = (jnp.zeros_like(bv), jnp.zeros_like(br))
rays = 512*512*(32*7 + 32*2*7 + 32*3)

fns = {}
for mode in ["highest", "bf16x3"]:
    os.environ["PSDR_GATHER"] = mode
    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]
    fn = jax.jit(step)
    float(jax.tree_util.tree_leaves(fn(p0, jnp.uint32(0), target))[0].sum())
    fns[mode] = fn
    print("compiled", mode, flush=True)

acc = {m: [] for m in fns}
for rep in range(4):
    for mode, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(jax.tree_util.tree_leaves(fn(p0, jnp.uint32(rep*13+i+1), target))[0].sum())
        acc[mode].append((time.perf_counter() - t0) / 3)
for mode, ts in acc.items():
    ms = [1e3*t for t in ts]
    print(f"{mode}: {min(ms):.1f} min / {sum(ms)/len(ms):.1f} mean ms/step  reps={['%.1f'%x for x in ms]}")
