"""Round-4 interleaved A/B on the full-term fused cbox step (512x512,
spp=sppe=sppse=32, depth 3): 2x2 variants of
  * attached interior megakernel (ops/shade_mega.py INTERIOR_MODE off/auto)
  * paired PE megakernel (PSDR_PE_PAIR 0/1; off = two sequential launches)

All variants keep the detached PE/SE megakernel.  Methodology per
CLAUDE.md: compile every variant once in ONE process, then alternate
timed blocks — fresh-process numbers scatter over a 60-90 ms band.

Run alone: nohup python -u scripts/r4_ab.py > /tmp/r4_ab.log 2>&1 &
"""
import os, sys, time
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

VARIANTS = [  # (interior_mode, pe_pair)
    ("off", "0"),   # round-3 shipping config minus both new paths
    ("off", "1"),   # pair only
    ("auto", "0"),  # interior only
    ("auto", "1"),  # both (current default)
]

fns = {}
grads = {}
for im, pp in VARIANTS:
    shade_mega.INTERIOR_MODE = im
    os.environ["PSDR_PE_PAIR"] = pp

    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

    fn = jax.jit(step)
    t0 = time.perf_counter()
    out = fn(p0, jnp.uint32(0), target)
    loss0 = float(out[0])
    g0 = jax.tree_util.tree_map(np.asarray, out[1])
    print(f"compiled interior={im} pair={pp} in "
          f"{time.perf_counter()-t0:.0f}s  loss={loss0:.4f}", flush=True)
    fns[(im, pp)] = fn
    grads[(im, pp)] = (loss0, g0)
shade_mega.INTERIOR_MODE = "auto"
os.environ["PSDR_PE_PAIR"] = "1"

# gradient agreement across variants (same sample set)
la, ga = grads[VARIANTS[0]]
for key in VARIANTS[1:]:
    lb, gb = grads[key]
    rels = []
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        rels.append(np.abs(a - b).sum() / (np.abs(a).sum() + 1e-12))
    print(f"{key}: loss rel {abs(la-lb)/abs(la):.2e}  "
          f"grad rels {[f'{r:.2e}' for r in rels]}", flush=True)

acc = {k: [] for k in fns}
for rep in range(5):
    for key, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(jax.tree_util.tree_leaves(
                fn(p0, jnp.uint32(rep*13+i+1), target))[0].sum())
        acc[key].append((time.perf_counter() - t0) / 3)
    print({f"{k[0]}/{k[1]}": f"{1e3*v[-1]:.1f}ms" for k, v in acc.items()},
          flush=True)

for key, v in acc.items():
    v = np.asarray(v)
    print(f"interior={key[0]} pair={key[1]}: mean {1e3*v.mean():.1f} ms/step"
          f"  min {1e3*v.min():.1f}  -> {rays/v.min()/1e6:.1f} Mrays/s (min)",
          flush=True)
