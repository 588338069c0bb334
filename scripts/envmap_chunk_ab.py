"""Interleaved chunk-size sweep on the envmap fused step (BASELINE #3).

The 32k edge / 96k interior chunk optima were tuned on the cbox workload,
where Li is megakernelized and per-chunk overhead is small.  The envmap
path pays per-chunk, per-sweep BVH machinery (two lax.sorts, dense
tile-vs-block culling, fetch-list build) — at 32k edge chunks that is
16 chunks x 6 sweeps for the PE pass alone.  Bigger chunks amortize it;
reverse-AD memory bounds the other side.

Run alone: nohup python -u scripts/envmap_chunk_ab.py > /tmp/envmap_chunk_ab.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.integrator import base as ibase
from psdr_jit_tpu.ops import bvh
from scenes import make_bunny_envmap
import os

RES, SPP, SPPE, SPPSE = 128, 32, 32, 32
# apply the BVH granularity winner when envmap_bvh_ab produced one
TR = int(os.environ.get("AB_TILE", "64"))
SU = int(os.environ.get("AB_SUPER", "512"))
CL = int(os.environ.get("AB_CLUSTER", "64"))
bvh.TILE_ROWS, bvh.SUPER, bvh.CLUSTER = TR, SU, CL
print(f"bvh knobs: tile={TR} super={SU} cluster={CL}", flush=True)

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

# (EDGE_CHUNK_LANES, CHUNK_LANES); total lanes per estimator = 524288
VARIANTS = [
    (32 * 1024, 96 * 1024),     # shipping config
    (128 * 1024, 96 * 1024),
    (512 * 1024, 96 * 1024),    # PE/SE in ONE chunk each
    (512 * 1024, 512 * 1024),   # everything single-chunk
]
if os.environ.get("AB_VARIANTS"):
    # e.g. AB_VARIANTS="512/96,512/192,512/256" (KiB per side)
    VARIANTS = [tuple(int(x) * 1024 for x in v.split("/"))
                for v in os.environ["AB_VARIANTS"].split(",")]

fns, loss0 = {}, {}
for ec, ic in VARIANTS:
    # the bunny routes to the BVH edge-chunk default since 2026-08-20;
    # pin both knobs so the sweep still controls the traced size
    ibase.EDGE_CHUNK_LANES, ibase.CHUNK_LANES = ec, ic
    ibase.EDGE_CHUNK_LANES_BVH = ec
    ibase.CHUNK_LANES_BVH = ic  # interior routing (2026-08-20) pins too

    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        # explicit warp: deliberate fixed-table bake for this A/B
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s,
                                    warp=_integ.warpper.get(0))[:2]

    fn = jax.jit(step)
    t0 = time.perf_counter()
    out = fn(p0, jnp.uint32(0), target)
    loss0[(ec, ic)] = float(out[0])
    print(f"compiled edge={ec//1024}k interior={ic//1024}k in "
          f"{time.perf_counter()-t0:.0f}s  loss={loss0[(ec, ic)]:.4f}",
          flush=True)
    fns[(ec, ic)] = fn
ibase.EDGE_CHUNK_LANES, ibase.CHUNK_LANES = 32 * 1024, 96 * 1024

ref = loss0[VARIANTS[0]]
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
    print({f"{k[0]//1024}k/{k[1]//1024}k": f"{1e3*v[-1]:.0f}ms"
           for k, v in acc.items()}, flush=True)

for key, v in acc.items():
    v = np.asarray(v)
    print(f"edge={key[0]//1024}k interior={key[1]//1024}k: "
          f"mean {1e3*v.mean():.1f} ms/step  min {1e3*v.min():.1f}  "
          f"-> {rays/v.min()/1e6:.2f} Mrays/s", flush=True)
