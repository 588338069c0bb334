"""Per-bounce live-lane fractions on the BVH workloads (VERDICT r4 #2).

Wavefront per-bounce compaction removes DEAD lanes; its maximum possible
saving is bounded by the dead fraction at each bounce.  The current design
already re-forms tiles every intersect call (ray_intersect_bvh sorts its
input each call) and parks dead lanes into self-culling tiles
(ops/bvh.py PARK_DEAD) — so physical compaction can only add value on top
if (a) lanes actually die and (b) the non-intersect (shading) ALU spent on
dead lanes is material.  This measures (a) exactly.

Workloads: the 102k-tri gallery (bench _time_large) and the envmap bunny
(BASELINE #3).  Both are CLOSED scenes (gallery = room; envmap adds an
enclosing bounding-box mesh so every ray terminates on geometry), so the
expectation is live fraction ~= 1 at every bounce — which would refute
compaction with data rather than argument.

Also measures the EDGE-pass validity fractions (boundary samples are
validity-masked; scene.cpp:1060-1064) for the same reason.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

import psdr_jit_tpu as psdr
from psdr_jit_tpu.core.types import Ray
from psdr_jit_tpu.core.sampler import Sampler
from psdr_jit_tpu.integrator.base import STREAM_INTERIOR, STREAM_SECONDARY
from psdr_jit_tpu.integrator import path as path_mod


def interior_live(sc, depth, spp, n_pix_cap=None):
    sd = jax.lax.stop_gradient(sc.data)
    opts = sc.opts
    n_pix = (opts.num_pixels if n_pix_cap is None
             else min(opts.num_pixels, n_pix_cap // spp))
    n = n_pix * spp

    @jax.jit
    def counts(sd, seed):
        lane = jnp.arange(n, dtype=jnp.uint32)
        sampler = Sampler(seed + jnp.uint32(STREAM_INTERIOR), lane)
        pix = (lane // spp).astype(jnp.int32)
        u = sampler.next_2d()
        xy = (jnp.stack([pix % opts.width, pix // opts.width], -1) + u)
        xy = xy / jnp.asarray([opts.width, opts.height], jnp.float32)
        ray = sd.sensors[0].sample_primary_ray(xy)
        active = jnp.ones(n, bool)
        its = sd.ray_intersect(ray, active, mode="solid", diff=False)
        active = active & its.valid
        fr = [active.mean(dtype=jnp.float32)]
        for _ in range(depth):
            its, active, _, _, _ = path_mod.bsdf_bounce(
                sd, its, sampler, active, diff=False
            )
            fr.append(active.mean(dtype=jnp.float32))
        return jnp.stack(fr)

    return np.asarray(counts(sd, jnp.uint32(3)))


def se_valid(sc, sppse, n_cap=1 << 18):
    from psdr_jit_tpu.integrator.edge import eval_secondary_edge

    sd = jax.lax.stop_gradient(sc.data)
    n = min(sc.opts.num_pixels * sppse, n_cap)

    @jax.jit
    def counts(sd, seed):
        lane = jnp.arange(n, dtype=jnp.uint32)
        sampler = Sampler(seed + jnp.uint32(STREAM_SECONDARY), lane)
        sample3 = sampler.next_nd(3)
        se_coin = (sampler.next_1d()
                   if sd.sec_edge_distrb.needs_coin else None)
        em_coin = (sampler.next_1d() if sd.emitter_coin_needed else None)
        # diff=True: the diff=False mode returns idx=-1 by design (the
        # guiding-integrand path); validity is only exposed via the
        # pixel idx of the differentiable path
        idx, value = eval_secondary_edge(
            sd, sd.sensors[0], sample3, diff=True,
            u_coin=se_coin, u_coin_emitter=em_coin,
        )
        return (idx >= 0).mean(dtype=jnp.float32)

    return float(counts(sd, jnp.uint32(5)))


def main():
    from scenes import make_gallery, make_bunny_envmap

    print("== gallery 102k tris (closed room), renderC depth=2 ==",
          flush=True)
    sc = make_gallery(width=256, height=256, spp=4, n_spheres=80, subdiv=3)
    sc.configure()
    fr = interior_live(sc, depth=2, spp=4)
    print("live fraction after camera hit, bounce1, bounce2:", fr, flush=True)

    print("== envmap bunny (BASELINE #3), depth=1 ==", flush=True)
    sc2 = make_bunny_envmap(width=128, height=128, spp=32, sppe=32, sppse=32)
    sc2.configure()
    fr2 = interior_live(sc2, depth=1, spp=32)
    print("live fraction after camera hit, bounce1:", fr2, flush=True)
    print("SE edge-sample validity fraction:", se_valid(sc2, 32), flush=True)

    from scenes import make_cbox
    sc3 = make_cbox(width=512, height=512, spp=32, sppe=32, sppse=32)
    sc3.configure()
    print("== cbox headline (reference check) depth=3 ==", flush=True)
    fr3 = interior_live(sc3, depth=3, spp=32)
    print("live fractions:", fr3, flush=True)
    print("SE validity:", se_valid(sc3, 32), flush=True)


if __name__ == "__main__":
    main()
