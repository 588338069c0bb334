"""Interleaved same-process A/B: PE-pass Li via the Pallas megakernel vs
the general XLA path, on the full-term fused cbox training step.

Methodology per CLAUDE.md: compile both variants once, alternate timed
blocks — fresh-process numbers scatter over a 60-90 ms machine-state band.
Also reports the isolated renderC forward (the megakernel covers the whole
detached interior there).

Run alone: nohup python -u scripts/mega_ab.py > /tmp/mega_ab.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import megakernel as mega
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
rc = {}
for mode in ["off", "auto"]:
    mega.MEGA_MODE = mode

    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

    fn = jax.jit(step)
    t0 = time.perf_counter()
    float(jax.tree_util.tree_leaves(fn(p0, jnp.uint32(0), target))[0].sum())
    print(f"compiled fused {mode} in {time.perf_counter()-t0:.0f}s", flush=True)
    fns[mode] = fn

    # forward renderC variant
    sdc = jax.lax.stop_gradient(sc.data)
    _i2 = psdr.PathTracer(max_depth=3)

    def fwd(sd, s, _integ=_i2):
        return _integ.render_impl(sd, sc.opts, 0, s, None, "C")

    f2 = jax.jit(fwd)
    t0 = time.perf_counter()
    float(f2(sdc, jnp.uint32(0)).sum())
    print(f"compiled fwd {mode} in {time.perf_counter()-t0:.0f}s", flush=True)
    rc[mode] = (f2, sdc)
mega.MEGA_MODE = "auto"

acc = {m: [] for m in fns}
accf = {m: [] for m in fns}
for rep in range(4):
    for mode, fn in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(jax.tree_util.tree_leaves(
                fn(p0, jnp.uint32(rep*13+i+1), target))[0].sum())
        acc[mode].append((time.perf_counter() - t0) / 3)
    for mode, (f2, sdc) in rc.items():
        t0 = time.perf_counter()
        for i in range(3):
            float(f2(sdc, jnp.uint32(rep*17+i+1)).sum())
        accf[mode].append((time.perf_counter() - t0) / 3)

for mode, ts in acc.items():
    ms = [1e3*t for t in ts]
    print(f"fused {mode}: {min(ms):.1f} min / {sum(ms)/len(ms):.1f} mean "
          f"ms/step ({rays/min(ms)/1e3:.1f} Mrays/s)  "
          f"reps={['%.1f' % x for x in ms]}")
for mode, ts in accf.items():
    ms = [1e3*t for t in ts]
    print(f"fwd   {mode}: {min(ms):.1f} min / {sum(ms)/len(ms):.1f} mean "
          f"ms/step  reps={['%.1f' % x for x in ms]}")
