"""Localize the TPU-only bias of the attached interior megakernel
(scripts/interior_bias.py: auto loss systematically ~1% below off).

Stages checked per-lane on the REAL backend, cbox 128x128 spp=4 depth=3:
  A. gather_rows_t exactness: out[:, n] == table[idx[n]] bitwise on TPU.
  B. stash hit chain vs the XLA intersect chain: camera-hit tri_id
     agreement fraction (flips should be ~0.1%).
  C. forward attached Li values: li_interior vs the XLA _li_xla(diff=True)
     primal per lane — count diverging lanes, their radiance sum, and the
     spatial pattern (uniform deficit = radiometric bug; sparse lanes =
     visibility flips).

Run alone: nohup python -u scripts/interior_debug.py > /tmp/interior_debug.log 2>&1 &
"""
import sys
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
import psdr_jit_tpu as psdr
from psdr_jit_tpu.ops import shade_mega, megakernel as mega
from psdr_jit_tpu.ops.gather import gather_rows_t
from psdr_jit_tpu.core.sampler import Sampler
from psdr_jit_tpu.integrator.base import interior_lane_setup
from scenes import make_cbox

W = 128
SPP = 4
DEPTH = 3

sc = make_cbox(width=W, height=W, spp=SPP)
sc.configure()
sd = sc.data
sd_det = jax.lax.stop_gradient(sd)
integ = psdr.PathTracer(max_depth=DEPTH)

# ---- A: gather_rows_t bitwise on TPU --------------------------------
tab = jnp.asarray(np.random.default_rng(1).normal(
    size=(192, shade_mega.TABLE_ROWS)).astype(np.float32))
idx = jnp.asarray(np.random.default_rng(2).integers(0, 192, size=7000),
                  jnp.int32)
got = jax.jit(gather_rows_t)(tab, idx)
want = np.asarray(tab)[np.asarray(idx)].T
ga = np.asarray(got)
print("A gather_rows_t: bitwise equal:", np.array_equal(ga, want),
      " max abs diff:", np.abs(ga - want).max(), flush=True)

# ---- B: stash hits vs XLA chain -------------------------------------
pix = jnp.arange(W * W, dtype=jnp.int32)
m, sampler, samples = interior_lane_setup(W, W, SPP, jnp.uint32(3), pix)
ray = sd_det.sensors[0].sample_primary_ray(samples, diff=False)
active = jnp.ones((m * SPP,), bool)
tables = mega.build_tables(sd_det)


@jax.jit
def stash_run(ro, rd, act, lane):
    return mega.li_mega_stash(*tables, ro, rd, act, lane, jnp.uint32(3),
                              depth=DEPTH, cnt0=1)


li_det, hits = stash_run(ray.o.reshape(-1, 3), ray.d.reshape(-1, 3),
                         active, sampler.lane)


@jax.jit
def xla_cam(ro, rd, act):
    from psdr_jit_tpu.core.types import Ray
    its = sd_det.ray_intersect(Ray(ro, rd), act, mode="solid", diff=False)
    return its.tri_id, its.valid, its.t

tid_x, val_x, t_x = xla_cam(ray.o.reshape(-1, 3), ray.d.reshape(-1, 3),
                            active)
tid_m = np.asarray(hits[0][0])
agree = (tid_m == np.asarray(tid_x)).mean()
print(f"B camera-hit tri_id agreement: {agree:.6f} "
      f"({(tid_m != np.asarray(tid_x)).sum()} of {tid_m.size})", flush=True)

# ---- C: forward attached Li per lane --------------------------------
def li_auto():
    s = Sampler(jnp.uint32(3), sampler.lane)
    s.cnt = 1
    return shade_mega.li_interior(
        sd, ray, active, s.lane, jnp.uint32(3), depth=DEPTH, cnt0=1)


def li_off():
    s = Sampler(jnp.uint32(3), sampler.lane)
    s.cnt = 1
    return integ._li_xla(sd, s, ray, active, True, None)


za = np.asarray(jax.jit(li_auto)())
zo = np.asarray(jax.jit(li_off)())
d = np.abs(za - zo).max(axis=-1)
bad = d > 1e-3
print(f"C lanes diverging >1e-3: {bad.sum()} of {d.size} "
      f"({bad.mean():.5f})", flush=True)
print(f"C sum Li auto {za.sum():.2f}  off {zo.sum():.2f}  "
      f"rel {(za.sum()-zo.sum())/zo.sum():+.4e}", flush=True)
print(f"C mean abs diff on NON-flip lanes: "
      f"{np.abs(za - zo)[~bad].mean():.3e}", flush=True)
# deficit concentrated where?  top-10 diverging lanes
order = np.argsort(-d)[:10]
for i in order:
    print(f"  lane {i}: auto {za[i]}  off {zo[i]}", flush=True)
# per-channel systematic shift on non-flip lanes
for k in range(3):
    dk = (za[~bad, k] - zo[~bad, k])
    print(f"C channel {k}: mean shift non-flip {dk.mean():+.3e} "
          f"(mean |val| {np.abs(zo[~bad, k]).mean():.3e})", flush=True)
