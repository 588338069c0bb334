"""Is the TPU-level gradient disagreement between the attached interior
megakernel (INTERIOR_MODE=auto) and the XLA chain (off) BIAS or NOISE?

r4_ab measured per-seed dv-grad rel-L1 ~0.44 on the full 512x512 step —
far above the interpreter-level 5e-3.  Hypothesis: ULP-level op-order
differences flip binary visibility tests on grazing (silhouette) lanes,
where vertex-position gradients concentrate; both estimators stay
unbiased, so their MEANS over seeds must converge while per-seed values
differ.  If the means do NOT converge, the kernel is biased on TPU.

Interior term only (sppe=sppse=0) to isolate the question.

Run alone: nohup python -u scripts/interior_bias.py > /tmp/interior_bias.log 2>&1 &
"""
import sys, time
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import shade_mega
from scenes import make_cbox

N_SEEDS = 16

sc = make_cbox(width=512, height=512, spp=32)
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

fns = {}
for mode in ["off", "auto"]:
    shade_mega.INTERIOR_MODE = mode

    def step(p, s, tgt, _integ=integ):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        return _integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

    fn = jax.jit(step)
    t0 = time.perf_counter()
    float(fn(p0, jnp.uint32(0), target)[0])
    print(f"compiled interior={mode} in {time.perf_counter()-t0:.0f}s",
          flush=True)
    fns[mode] = fn
shade_mega.INTERIOR_MODE = "auto"

g = {m: [] for m in fns}
losses = {m: [] for m in fns}
for s in range(N_SEEDS):
    for m, fn in fns.items():
        loss, grads = fn(p0, jnp.uint32(s), target)
        losses[m].append(float(loss))
        g[m].append([np.asarray(x) for x in jax.tree_util.tree_leaves(grads)])
    dv_rel = (np.abs(g['auto'][-1][0] - g['off'][-1][0]).sum()
              / (np.abs(g['off'][-1][0]).sum() + 1e-12))
    print(f"seed {s}: loss off {losses['off'][-1]:.2f} auto "
          f"{losses['auto'][-1]:.2f}  per-seed dv rel {dv_rel:.3f}", flush=True)

for leaf in range(len(g["off"][0])):
    a = np.mean([x[leaf] for x in g["off"]], axis=0)
    b = np.mean([x[leaf] for x in g["auto"]], axis=0)
    # per-seed scatter of the off estimator, as the noise yardstick
    std = np.mean([np.abs(x[leaf] - a).sum() for x in g["off"]])
    rel_means = np.abs(a - b).sum() / (np.abs(a).sum() + 1e-12)
    sem = std / np.abs(a).sum() / np.sqrt(N_SEEDS)
    print(f"leaf {leaf}: rel-L1 of MEANS {rel_means:.4f}  "
          f"(per-seed scatter rel {std / np.abs(a).sum():.4f}, "
          f"sem {sem:.4f})", flush=True)
lo, la = np.mean(losses["off"]), np.mean(losses["auto"])
lstd = np.std(losses["off"])
print(f"loss means: off {lo:.2f}  auto {la:.2f}  rel {abs(la-lo)/lo:.2e}  "
      f"(off per-seed std {lstd:.2f})", flush=True)
