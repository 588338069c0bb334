"""Interleaved same-process A/B: attached interior Li via the shading
megakernel pair (ops/shade_mega.py) vs the general XLA chain, on the
full-term fused cbox training step (512x512, spp=sppe=sppse=32, depth 3).

Both variants keep the PE/SE detached megakernel (ops/megakernel.py) —
this isolates the interior term.  Methodology per CLAUDE.md: compile both
once, alternate timed blocks.

Run alone: nohup python -u scripts/interior_ab.py > /tmp/interior_ab.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import shade_mega
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
grads = {}
for mode in ["off", "auto"]:
    shade_mega.INTERIOR_MODE = mode

    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

    fn = jax.jit(step)
    t0 = time.perf_counter()
    out = fn(p0, jnp.uint32(0), target)
    loss0 = float(out[0])
    g0 = jax.tree_util.tree_map(np.asarray, out[1])
    print(f"compiled fused interior={mode} in {time.perf_counter()-t0:.0f}s"
          f"  loss={loss0:.4f}", flush=True)
    fns[mode] = fn
    grads[mode] = (loss0, g0)
shade_mega.INTERIOR_MODE = "auto"

# gradient agreement between the two variants (same sample set)
la, ga = grads["off"]
lb, gb = grads["auto"]
print(f"loss rel diff: {abs(la-lb)/abs(la):.2e}")
for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(ga),
                               jax.tree_util.tree_leaves(gb))):
    rel = np.abs(a - b).sum() / (np.abs(a).sum() + 1e-12)
    print(f"grad leaf {i}: rel {rel:.3e}")

acc = {m: [] for m in fns}
for rep in range(5):
    for mode, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(jax.tree_util.tree_leaves(
                fn(p0, jnp.uint32(rep*13+i+1), target))[0].sum())
        acc[mode].append((time.perf_counter() - t0) / 3)
    print({m: f"{1e3*v[-1]:.1f}ms" for m, v in acc.items()}, flush=True)

for mode, v in acc.items():
    v = np.asarray(v)
    print(f"interior={mode}: mean {1e3*v.mean():.1f} ms/step  "
          f"min {1e3*v.min():.1f}  -> {rays/v.min()/1e6:.1f} Mrays/s (min)",
          flush=True)
