"""Attached interior-shading megakernel (forward + adjoint, two launches).

The fused training step's interior term is an ATTACHED Li: gradients flow
through the closed-form intersection reconstruction, shading normals,
light sampling and BSDF/emitter parameters (integrator/path.py diff=True,
mirroring reference path.cpp:30-124 under drjit AD).  In XLA that shading
chain lowers to ~1900 small fusions per chunk whose forward+pullback
dominate the interior scan (~150 of its ~205 ms/step on the cbox
workload, docs/PERFORMANCE.md) — dispatch and materialization overhead,
not FLOPs (the attached math is ~1k ops/lane, minutes below the VPU
roofline).

This module replaces that chain with THREE launches per chunk:

1. ``ops.megakernel.li_mega_stash`` — the detached trace pass: one Pallas
   kernel runs all ``1 + 2*depth`` intersection sweeps and records each
   hit's ``(tri_id, u, v)`` payload (hit ids are detached in the reference
   formulation too: sampling is detached, the integrand is attached).
2. ``gather_rows_t`` — ONE one-hot MXU gather fetches every attached
   per-hit field row (geometry, normals, albedo, emission) for all hits,
   in the transposed ``(fields, lanes)`` layout the kernel tiles densely.
3. ``_shade`` (this module) — a ``jax.custom_vjp`` Pallas pair:

   * forward: one elementwise kernel computes the attached Li per lane,
   * backward: one kernel re-traces the same math and calls ``jax.vjp``
     INSIDE the kernel body — the whole transpose is derived by JAX and
     lowered by Mosaic as straight-line per-lane code (no hand adjoints).
     Per-hit row cotangents come out per-lane and flow back into the
     field table through ``gather_rows_t``'s MXU transpose; the tiny
     light-table/misc cotangents are broadcast transposes (full-tile
     reductions) accumulated across the sequential grid.

Scope: the detached megakernel's (constant one-sided diffuse BSDFs, one
constant-radiance area light, <= MEGA_MAX_TRIS triangles — the
README/BASELINE cbox class).  Engaged only on the reverse-mode fused path
(``vjp_ok=True``): ``custom_vjp`` functions cannot be forward-differentiated,
so ``jax.jvp`` grad images keep the general XLA path.

Sample-for-sample parity with the XLA path holds when UV frames are
degenerate (no texture coordinates — sh_frame falls back to the Duff ONB
both here and in scene.py); with valid UV frames the bounce directions
differ azimuthally (same cosine distribution, different parameterization),
so renders agree at the estimator level only — exactly the detached
megakernel's existing contract (tests/test_megakernel.py docstring).
"""

from __future__ import annotations

import functools
import os as _os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import EPSILON, SHADOW_EPSILON, INV_PI
from ..core.sampler import pcg4d, _u32_to_unit_float
from ..core.math import safe_div as _sdiv_host
from .intersect_pallas import LANES
from .megakernel import (
    applicable as mega_applicable,
    build_tables,
    li_mega_stash,
    _cosine_hemisphere,
    _SALT,
)
from .gather import gather_rows, gather_rows_t

_TINY = 1e-20
R_ROWS_SHADE = 16  # rays per tile row block (VMEM: vjp residuals dominate)
# the FORWARD kernel holds no vjp residuals, so its tile can be larger
# (scoped-VMEM bound ~16 MB: 7 hit blocks x 30 rows x R x 128 x 4 B).
# Swept 16/32/64 interleaved on the headline (2026-08-21): a wash
# (456.8/456.5/456.9 ms min) — the forward kernel is not tile-bound.
# Backward at 32 rows fails to compile (scoped-VMEM OOM), 8 is a wash.
R_ROWS_SHADE_FWD = int(_os.environ.get("PSDR_SHADE_FWD_ROWS",
                                       str(R_ROWS_SHADE)))

# -- per-hit packed row layout (fields-major, see li_interior) -------------
ROW_P0, ROW_E1, ROW_E2 = 0, 3, 6
ROW_N0, ROW_N1, ROW_N2 = 9, 12, 15
ROW_FN, ROW_AREA, ROW_FNMASK = 18, 21, 22
ROW_ALB, ROW_EMIT, ROW_ISEM = 23, 26, 29
TABLE_ROWS = 30           # attached columns gathered per hit
ROW_ID, ROW_U, ROW_V = 30, 31, 32   # detached stash payload rows
HIT_ROWS = 33
LIGHT_ROWS = 12           # cdf, pmf, p0(3), e1(3), e2(3), face_area
MISC_COLS = 8             # total_mass, total_area, sampling_weight,
#                           ps_pdf (detached), 4x pad
MAX_LIGHT_TRIS = 64       # light-table selects are unrolled in-kernel

# PSDR_MEGA_INTERIOR: "auto" (follow PSDR_MEGA), "0"/"off" (interior term
# always uses the general XLA path; PE/SE detached megakernel unaffected).
INTERIOR_MODE = _os.environ.get("PSDR_MEGA_INTERIOR", "auto")

# Hit-row packing around the shade kernel (r5 device profile,
# docs/PERFORMANCE.md):
#   "cat"  — legacy: ONE gather for all hits, then per-hit
#            slice+concat(id,u,v)+pad into (33, rows, LANES) blocks.  The
#            seven 12.9 MB concats lowered to ~26 ms/step of copies, the
#            slices to ~8 ms, and the backward re-assembled the (30, 7n)
#            cotangent with the mirror copies.
#   "split" — per-hit gather_rows_t calls feeding (30, rows, LANES)
#            blocks directly (reshape is layout-free); id/u/v ride as
#            separate (rows, LANES) tiles.  No concat, no slice, and the
#            backward scatters each hit's cotangent through its own MXU
#            dot.
SHADE_PACK = _os.environ.get("PSDR_SHADE_PACK", "split")


def enabled():
    """-> (use, interpret) for the attached interior megakernel."""
    from . import megakernel as mega

    if INTERIOR_MODE in ("0", "off"):
        return False, False
    return mega.enabled()


# -- safe math on per-lane component tuples (mirrors core/math.py) ---------
def _sdiv(a, b):
    safe_b = jnp.where(jnp.abs(b) > _TINY, b, 1.0)
    return jnp.where(jnp.abs(b) > _TINY, a / safe_b, 0.0)


def _ssqrt(x):
    return jnp.where(x > 0.0, jnp.sqrt(jnp.maximum(x, _TINY)), 0.0)


def _srsqrt(x):
    return jnp.where(x > 0.0, jax.lax.rsqrt(jnp.maximum(x, _TINY)), 0.0)


def _mis(p1, p2):
    w1 = jnp.square(p1)
    w2 = jnp.square(p2)
    return _sdiv(w1, w1 + w2)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _normalize3(v):
    inv = _srsqrt(_dot3(v, v))
    return _scale3(v, inv)


def _row3(H, r):
    return (H[r], H[r + 1], H[r + 2])


def _fields(H):
    """Split one per-hit block into named components.

    ``H`` is either a legacy (HIT_ROWS, ...) array whose last three rows
    carry the detached stash payload (id/u/v), or — the "split" packing —
    a 4-tuple ``(H30 (TABLE_ROWS, ...), id, u, v)`` with the payload as
    separate per-lane tiles.  Payload/flag components are detached by
    construction; the geometry/normal/material rows are attached."""
    sg = jax.lax.stop_gradient
    if isinstance(H, tuple):
        H, idf, uf, vf = H
        valid = sg(idf) >= 0.0
        u, v = sg(uf), sg(vf)
    else:
        valid = sg(H[ROW_ID]) >= 0.0
        u, v = sg(H[ROW_U]), sg(H[ROW_V])
    return dict(
        p0=_row3(H, ROW_P0), e1=_row3(H, ROW_E1), e2=_row3(H, ROW_E2),
        n0=_row3(H, ROW_N0), n1=_row3(H, ROW_N1), n2=_row3(H, ROW_N2),
        fn=_row3(H, ROW_FN), area=H[ROW_AREA],
        fnmask=sg(H[ROW_FNMASK]) > 0.5,
        alb=_row3(H, ROW_ALB), emit=_row3(H, ROW_EMIT),
        isem=sg(H[ROW_ISEM]) > 0.5,
        valid=valid, u=u, v=v,
    )


def _shading_normal(F, u, v):
    """normalize(bilinear(n0, n1-n0, n2-n0, uv)), face normal where masked
    (scene.py ray_intersect:186-187 — same op order for gradient parity)."""
    n = tuple(
        F["n0"][k] + (F["n1"][k] - F["n0"][k]) * u
        + (F["n2"][k] - F["n0"][k]) * v
        for k in range(3)
    )
    n = _normalize3(n)
    return tuple(jnp.where(F["fnmask"], F["fn"][k], n[k]) for k in range(3))


def _li_attached(hits, light, misc, o, d, draws, act, depth: int,
                 hide_emitters: bool):
    """The attached interior Li for one lane tile — the function the
    backward kernel differentiates with in-kernel ``jax.vjp``.

    Mirrors, op for op, the diff=True branches of integrator/path.py
    (nee_contribution:17-49, bsdf_bounce:52-80, Li:124-152) with the
    closed-form intersection reconstruction of scene.py ray_intersect
    (solid mode for the camera hit, path mode for all secondary hits) and
    mesh.py sample_position:386-417, specialized to constant diffuse +
    one constant area light.  Every ``stop_gradient`` placement below
    matches the XLA formulation exactly (detached pdfs, attached values).

    ``hits``: per-intersection (HIT_ROWS, ...) blocks; ``light``:
    (LIGHT_ROWS, L); ``misc``: (1, MISC_COLS); ``o``/``d``: camera ray
    component triples; ``draws``: detached pcg4d 4-tuples (2 per depth).
    Returns (r, g, b) per-lane radiance.
    """
    sg = jax.lax.stop_gradient
    total_mass = misc[0, 0]
    total_area = misc[0, 1]
    sampling_weight = misc[0, 2]
    ps_pdf = sg(misc[0, 3])
    n_light = light.shape[1]

    # ---- camera hit: solid-angle formulation (scene.py:178-184) ---------
    F0 = _fields(hits[0])
    h = _cross3(d, F0["e2"])
    a = _dot3(F0["e1"], h)
    f = _sdiv(1.0, a)
    s = _sub3(o, F0["p0"])
    uu = f * _dot3(s, h)
    q = _cross3(s, F0["e1"])
    vv = f * _dot3(d, q)
    t0 = f * _dot3(F0["e2"], q)
    p = tuple(o[k] + t0 * d[k] for k in range(3))
    sh_n = _shading_normal(F0, uu, vv)
    wi_z = -_dot3(sh_n, d)          # its.wi.z = dot(sh_n, -ray.d)

    valid = F0["valid"]
    active = act & valid
    isem = F0["isem"]
    alb = F0["alb"]
    emit = F0["emit"]

    zero = jnp.zeros_like(t0)
    res = [zero, zero, zero]
    if not hide_emitters:
        ok = active & isem & (wi_z > 0.0)
        for k in range(3):
            res[k] = jnp.where(ok, emit[k], 0.0)

    thr = [jnp.ones_like(t0)] * 3

    for i in range(depth):
        un = draws[2 * i]
        ub = draws[2 * i + 1]

        # ---- NEE (path.py nee_contribution) --------------------------
        # sample_emitter_position -> mesh sample_position with reuse
        scaled = un[0] * total_mass
        idxl = jnp.zeros_like(t0, dtype=jnp.int32)
        for j in range(n_light):
            idxl = idxl + (light[0, j] < scaled).astype(jnp.int32)
        idxl = jnp.minimum(idxl, n_light - 1)
        lower = zero
        pmf = zero
        area_l = zero
        p0l = [zero, zero, zero]
        e1l = [zero, zero, zero]
        e2l = [zero, zero, zero]
        for j in range(n_light):
            m = idxl == j
            lower = jnp.where(m, 0.0 if j == 0 else light[0, j - 1], lower)
            pmf = jnp.where(m, light[1, j], pmf)
            area_l = jnp.where(m, light[11, j], area_l)
            for k in range(3):
                p0l[k] = jnp.where(m, light[2 + k, j], p0l[k])
                e1l[k] = jnp.where(m, light[5 + k, j], e1l[k])
                e2l[k] = jnp.where(m, light[8 + k, j], e2l[k])
        u0r = jnp.clip(_sdiv(scaled - lower, pmf), 0.0, 1.0)
        tq = _ssqrt(1.0 - u0r)                 # square_to_uniform_triangle
        b0 = 1.0 - tq
        b1 = tq * un[1]
        pl_ = tuple(p0l[k] + e1l[k] * b0 + e2l[k] * b1 for k in range(3))
        psJ = _sdiv(area_l, sg(area_l))        # mesh.py:407 AD Jacobian

        active_direct = active & ~(valid & isem)
        wod = _sub3(pl_, p)
        dist_sqr = _dot3(wod, wod)
        dist = _ssqrt(dist_sqr)
        wod = _scale3(wod, _sdiv(1.0, dist))

        # shadow hit, path-mode reconstruction (scene.py:170-177)
        F1 = _fields(hits[1 + 2 * i])
        p1 = tuple(
            F1["p0"][k] + F1["e1"][k] * F1["u"] + F1["e2"][k] * F1["v"]
            for k in range(3)
        )
        dv1 = _sub3(p1, p)
        t1 = _ssqrt(_dot3(dv1, dv1))
        dirv1 = _scale3(dv1, _sdiv(1.0, t1))
        sh_n1 = _shading_normal(F1, F1["u"], F1["v"])
        wi1_z = -_dot3(sh_n1, dirv1)

        active_direct = (
            active_direct & F1["valid"]
            & (t1 > dist - SHADOW_EPSILON) & F1["isem"]
        )
        cos_val = -_dot3(F1["fn"], wod)        # dot(its1.n, -wod)
        g_val = _sdiv(jnp.abs(cos_val), dist_sqr)
        # Le(its1, active) — gated by the Li-level active, path.py:36
        le1_ok = active & F1["valid"] & F1["isem"] & (wi1_z > 0.0)
        cos_o = _dot3(sh_n, wod)
        ev_ok = active_direct & (wi_z > 0.0) & (cos_o > 0.0)
        bsdf_scale = jnp.where(ev_ok, INV_PI * cos_o, 0.0) * (
            g_val * psJ * _sdiv(1.0, ps_pdf)
        )
        pdf1 = jnp.where(
            active_direct & (sg(wi_z) > 0.0) & (sg(cos_o) > 0.0),
            INV_PI * sg(cos_o), 0.0,
        ) * sg(g_val)
        ok_nee = active_direct & (pdf1 != 0.0)
        weight1 = _mis(ps_pdf, pdf1)
        for k in range(3):
            contrib = thr[k] * jnp.where(le1_ok, F1["emit"][k], 0.0)
            contrib = contrib * alb[k] * bsdf_scale * weight1
            res[k] = res[k] + jnp.where(ok_nee, contrib, 0.0)

        # ---- BSDF bounce (path.py bsdf_bounce) ------------------------
        # detached cosine-hemisphere sample: only pdf = cos/pi is consumed
        _lx, _ly, lz = _cosine_hemisphere(ub[1], ub[2])
        bs_pdf = INV_PI * lz                    # detached draws
        F2 = _fields(hits[2 + 2 * i])
        p2 = tuple(
            F2["p0"][k] + F2["e1"][k] * F2["u"] + F2["e2"][k] * F2["v"]
            for k in range(3)
        )
        dv2 = _sub3(p2, p)
        t2 = _ssqrt(_dot3(dv2, dv2))
        wo = _scale3(dv2, _sdiv(1.0, t2))
        t_det = sg(t2)
        cos_val2 = -_dot3(F2["fn"], wo)
        g2 = _sdiv(jnp.abs(cos_val2), jnp.square(t2))
        J2 = _sdiv(F2["area"], sg(F2["area"]))
        j2 = jnp.where(F2["valid"], J2, 1.0)
        g2 = jnp.where(F2["valid"], g2, 1.0)
        pdf0 = bs_pdf * sg(g2)
        # active &= bs.is_valid & its1.valid (path.py:60); bs.is_valid is
        # stop_gradient(active & cos_i > 0) — same boolean values
        active = active & (sg(wi_z) > 0.0) & F2["valid"]
        cos_o2 = _dot3(sh_n, wo)
        ev_ok2 = active & (wi_z > 0.0) & (cos_o2 > 0.0)
        ev_scale = jnp.where(ev_ok2, INV_PI * cos_o2, 0.0)
        bval_scale = ev_scale * (g2 * j2 * _sdiv(1.0, pdf0))
        bval_scale = jnp.where(t_det < EPSILON, 0.0, bval_scale)
        e_pdf = jnp.where(
            active & F2["isem"],
            sampling_weight * _sdiv(1.0, total_area), 0.0,
        )
        weight2 = _mis(pdf0, e_pdf)
        for k in range(3):
            thr[k] = thr[k] * alb[k] * bval_scale
        sh_n2 = _shading_normal(F2, F2["u"], F2["v"])
        wi2_z = -_dot3(sh_n2, wo)
        le2_ok = active & F2["isem"] & (wi2_z > 0.0)
        for k in range(3):
            le2 = jnp.where(le2_ok, F2["emit"][k], 0.0)
            res[k] = res[k] + jnp.where(active, le2 * thr[k] * weight2, 0.0)

        # roll state to the bounce hit
        p = p2
        sh_n = sh_n2
        wi_z = wi2_z
        alb = F2["alb"]
        emit = F2["emit"]
        isem = F2["isem"]
        valid = F2["valid"]

    return res[0], res[1], res[2]


def _mk_shade_kernel(depth: int, cnt0: int, hide_emitters: bool,
                     n_hits: int, want_vjp: bool, split: bool):
    def kernel(seed_ref, *refs):
        hit_refs = refs[:n_hits]
        pos = n_hits
        if split:
            pl_refs = refs[pos:pos + 3 * n_hits]
            pos += 3 * n_hits
        light_ref = refs[pos]
        misc_ref = refs[pos + 1]
        lane_ref = refs[pos + 2]
        act_ref = refs[pos + 3]
        o_refs = refs[pos + 4:pos + 7]
        d_refs = refs[pos + 7:pos + 10]
        pos = pos + 10
        if want_vjp:
            ct_refs = refs[pos:pos + 3]
            pos += 3
        out_refs = refs[pos:]

        lane_u = lane_ref[...]
        act = act_ref[...] > 0
        shape = lane_u.shape
        seed_b = jnp.full(shape, seed_ref[0], jnp.uint32)
        salt_b = jnp.full(shape, _SALT, jnp.uint32)
        draws = []
        for c in range(2 * depth):
            cb = jnp.full(shape, cnt0 + c, jnp.uint32)
            v = pcg4d(lane_u, cb, seed_b, salt_b)
            draws.append(tuple(_u32_to_unit_float(u) for u in v))

        hits = tuple(r[...] for r in hit_refs)
        if split:
            # detached payload (id, u, v) tiles, closed over by the
            # differentiated function — only the 30 attached table rows
            # are vjp inputs
            payloads = tuple(
                (pl_refs[3 * k][...], pl_refs[3 * k + 1][...],
                 pl_refs[3 * k + 2][...])
                for k in range(n_hits)
            )

            def with_payload(hh):
                return tuple((hh[k],) + payloads[k] for k in range(n_hits))
        else:
            def with_payload(hh):
                return hh
        light = light_ref[...]
        misc = misc_ref[...]
        o = tuple(r[...] for r in o_refs)
        d = tuple(r[...] for r in d_refs)

        if not want_vjp:
            r_, g_, b_ = _li_attached(with_payload(hits), light, misc, o, d,
                                      draws, act, depth, hide_emitters)
            out_refs[0][...] = r_
            out_refs[1][...] = g_
            out_refs[2][...] = b_
            return

        _, pull = jax.vjp(
            lambda hh, lt, mc, oo, dd: _li_attached(
                with_payload(hh), lt, mc, oo, dd, draws, act, depth,
                hide_emitters),
            hits, light, misc, o, d,
        )
        cts = tuple(r[...] for r in ct_refs)
        d_hits, d_light, d_misc, d_o, d_d = pull(cts)
        for k in range(n_hits):
            out_refs[k][...] = d_hits[k]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            out_refs[n_hits][...] = jnp.zeros_like(d_light)
            out_refs[n_hits + 1][...] = jnp.zeros_like(d_misc)

        out_refs[n_hits][...] += d_light
        out_refs[n_hits + 1][...] += d_misc
        for k in range(3):
            out_refs[n_hits + 2 + k][...] = d_o[k]
            out_refs[n_hits + 5 + k][...] = d_d[k]

    return kernel


def _shade_call(hits_p, payloads, light, misc, o_comps, d_comps, lane2, act2,
                seed_arr, cts, depth: int, cnt0: int, hide_emitters: bool,
                interpret: bool):
    split = len(payloads) > 0
    n_hits = len(hits_p)
    n_rows = lane2.shape[0]
    r_rows = R_ROWS_SHADE if cts is not None else min(
        R_ROWS_SHADE_FWD, n_rows)
    while n_rows % r_rows:
        r_rows //= 2
    grid = (n_rows // r_rows,)
    tile = pl.BlockSpec((r_rows, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    lw = light.shape[1]
    hit_rows = TABLE_ROWS if split else HIT_ROWS
    hit_spec = pl.BlockSpec((hit_rows, r_rows, LANES),
                            lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM)
    light_spec = pl.BlockSpec((LIGHT_ROWS, lw), lambda i, *_: (0, 0),
                              memory_space=pltpu.VMEM)
    misc_spec = pl.BlockSpec((1, MISC_COLS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [hit_spec] * n_hits
    args = list(hits_p)
    if split:
        for trip in payloads:
            in_specs += [tile] * 3
            args += list(trip)
    in_specs += [light_spec, misc_spec] + [tile] * 8
    args += [light, misc, lane2, act2, *o_comps, *d_comps]
    lanes_sd = jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)
    if cts is None:
        out_specs = [tile] * 3
        out_shape = [lanes_sd] * 3
    else:
        in_specs = in_specs + [tile] * 3
        args = args + list(cts)
        out_specs = ([hit_spec] * n_hits + [light_spec, misc_spec]
                     + [tile] * 6)
        out_shape = (
            [jax.ShapeDtypeStruct((hit_rows, n_rows, LANES), jnp.float32)]
            * n_hits
            + [jax.ShapeDtypeStruct((LIGHT_ROWS, lw), jnp.float32),
               jax.ShapeDtypeStruct((1, MISC_COLS), jnp.float32)]
            + [lanes_sd] * 6
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=in_specs, out_specs=out_specs,
    )
    return pl.pallas_call(
        _mk_shade_kernel(depth, cnt0, hide_emitters, n_hits, cts is not None,
                         split),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(jnp.asarray(seed_arr, jnp.uint32).reshape(1), *args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _shade(depth, cnt0, hide_emitters, interpret,
           hits_p, payloads, light, misc, o_comps, d_comps, lane2, act2,
           seed_arr):
    """Attached interior radiometry, (r, g, b) per-lane blocks.

    Reverse-differentiable w.r.t. ``hits_p``/``light``/``misc``/ray
    components (the backward Pallas kernel derives the whole transpose via
    in-kernel ``jax.vjp``); integer operands get float0 cotangents and the
    detached ``payloads`` (split packing: per-hit id/u/v tiles, empty
    tuple for legacy packing) get zeros."""
    return _shade_call(hits_p, payloads, light, misc, o_comps, d_comps,
                       lane2, act2, seed_arr, None, depth, cnt0,
                       hide_emitters, interpret)


def _shade_fwd(depth, cnt0, hide_emitters, interpret,
               hits_p, payloads, light, misc, o_comps, d_comps, lane2, act2,
               seed_arr):
    out = _shade_call(hits_p, payloads, light, misc, o_comps, d_comps,
                      lane2, act2, seed_arr, None, depth, cnt0,
                      hide_emitters, interpret)
    return out, (hits_p, payloads, light, misc, o_comps, d_comps, lane2,
                 act2, seed_arr)


def _float0_like(x):
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


def _shade_bwd(depth, cnt0, hide_emitters, interpret, res, cts):
    (hits_p, payloads, light, misc, o_comps, d_comps, lane2, act2,
     seed_arr) = res
    out = _shade_call(hits_p, payloads, light, misc, o_comps, d_comps,
                      lane2, act2, seed_arr, tuple(cts), depth, cnt0,
                      hide_emitters, interpret)
    n_hits = len(hits_p)
    d_hits = tuple(out[:n_hits])
    d_light = out[n_hits]
    d_misc = out[n_hits + 1]
    d_o = tuple(out[n_hits + 2:n_hits + 5])
    d_d = tuple(out[n_hits + 5:n_hits + 8])
    # payload tiles are detached (stop_gradient at _fields): zero
    # cotangents, DCE'd upstream (their producers sit under stop_gradient)
    d_payloads = jax.tree_util.tree_map(jnp.zeros_like, payloads)
    return (d_hits, d_payloads, d_light, d_misc, d_o, d_d,
            _float0_like(lane2), _float0_like(act2), _float0_like(seed_arr))


_shade.defvjp(_shade_fwd, _shade_bwd)


def applicable(sd) -> bool:
    """Static scope check for the attached interior megakernel."""
    if not mega_applicable(sd):
        return False
    em = sd.emitters[0]
    return em.mesh_data.tri.p0.shape[0] <= MAX_LIGHT_TRIS


def _attached_tables(sd):
    """(F, TABLE_ROWS) per-face attached field table + (LIGHT_ROWS, L)
    light table + (1, MISC_COLS) scalars, built WITHOUT stop_gradient —
    the differentiable mirror of ops/megakernel.build_tables."""
    tri = sd.tri
    # jnp.asarray: tables/ids may mix host Literals and tracers depending
    # on what the surrounding vjp trace lifted (see scene.py emitter_slot)
    fmid = jnp.asarray(sd.face_mesh_id)
    bslot = jnp.asarray(sd.mesh_bsdf_slot)[fmid]          # (F,) detached
    alb_table = jnp.stack([b.reflectance.data.reshape(3) for b in sd.bsdfs])
    alb = jnp.where(
        (bslot >= 0)[:, None],
        gather_rows(alb_table, jnp.maximum(bslot, 0)), 0.0)
    eslot = jnp.asarray(sd.mesh_emitter_slot)[fmid]
    em = sd.emitters[0]
    emit = jnp.where(
        (eslot >= 0)[:, None], em.radiance.reshape(1, 3), 0.0)
    is_em = (eslot >= 0).astype(jnp.float32)
    fnmask = sd.face_normal_mask.astype(jnp.float32)
    table = jnp.concatenate([
        tri.p0, tri.e1, tri.e2, tri.n0, tri.n1, tri.n2,
        tri.face_normal, tri.face_area[:, None], fnmask[:, None],
        alb, emit, is_em[:, None],
    ], axis=1)                                            # (F, TABLE_ROWS)

    md = em.mesh_data
    ltri = md.tri
    light = jnp.concatenate([
        md.face_distrb.cdf[None, :], md.face_distrb.pmf[None, :],
        ltri.p0.T, ltri.e1.T, ltri.e2.T, ltri.face_area[None, :],
    ], axis=0)                                            # (LIGHT_ROWS, L)
    misc = jnp.concatenate([
        jnp.stack([
            md.face_distrb.total, md.total_area, em.sampling_weight,
            jax.lax.stop_gradient(_sdiv_host(1.0, md.total_area)),
        ]),
        jnp.zeros((MISC_COLS - 4,), jnp.float32),
    ]).reshape(1, MISC_COLS)
    return table, light, misc


def li_interior(sd, ray, active, lane, seed, depth: int, cnt0: int,
                hide_emitters: bool = False, interpret: bool = False):
    """Attached interior Li via the three-launch megakernel path.

    Drop-in replacement for the diff=True Li of integrator/path.py within
    :func:`applicable` scope — same sampler schedule (2 draws per depth
    starting at ``cnt0``), same estimator, reverse-differentiable w.r.t.
    every attached SceneData leaf and the camera ray."""
    sd_det = jax.lax.stop_gradient(sd)
    tables = build_tables(sd_det)
    ro = ray.o.reshape(-1, 3)
    rd = ray.d.reshape(-1, 3)
    act_flat = active.reshape(-1)
    lane_flat = lane.reshape(-1)
    _li_det, hits = li_mega_stash(
        *tables,
        jax.lax.stop_gradient(ro), jax.lax.stop_gradient(rd),
        act_flat, lane_flat, seed,
        depth=depth, cnt0=cnt0, hide_emitters=hide_emitters,
        interpret=interpret,
    )

    table, light, misc = _attached_tables(sd)
    n = ro.shape[0]
    tile = R_ROWS_SHADE * LANES
    n_pad = -(-n // tile) * tile
    n_rows = n_pad // LANES

    def pad1(x, fill):
        if n_pad != n:
            x = jnp.concatenate(
                [x, jnp.full((n_pad - n,), fill, x.dtype)], axis=0)
        return x

    n_hits = len(hits)
    if SHADE_PACK == "split":
        # Per-hit gathers feeding (TABLE_ROWS, rows, LANES) blocks
        # directly; id/u/v ride as separate tiles.  The legacy single
        # concatenated gather spent ~26 ms/step materializing seven
        # 12.9 MB concat copies (plus their backward mirrors) on the
        # headline — the reshape below is layout-free (docs/PERFORMANCE.md
        # round-5).
        hits_p, payloads = [], []
        for hid, hu, hv in hits:
            rows_t = gather_rows_t(table, jnp.maximum(hid, 0))  # (30, n)
            if n_pad != n:
                rows_t = jnp.pad(rows_t, ((0, 0), (0, n_pad - n)))
            # NOTE: the (30, n) -> (30, n_rows, LANES) relayout costs one
            # bandwidth-bound copy per hit per kernel (~24 ms/step total,
            # r5 profile); an optimization_barrier to share one
            # materialization measured no change (455.3 vs 455.2 min).
            hits_p.append(rows_t.reshape(TABLE_ROWS, n_rows, LANES))
            payloads.append((
                pad1(hid.astype(jnp.float32), -1.0).reshape(n_rows, LANES),
                pad1(hu, 0.0).reshape(n_rows, LANES),
                pad1(hv, 0.0).reshape(n_rows, LANES),
            ))
        payloads = tuple(payloads)
    else:
        # ONE one-hot MXU gather for all hits' rows, concatenated layout
        idx_cat = jnp.concatenate(
            [jnp.maximum(h[0], 0) for h in hits], axis=0)  # (n_hits*n,)
        rows_cat = gather_rows_t(table, idx_cat)           # (TABLE_ROWS, HN)
        hits_p = []
        for k, (hid, hu, hv) in enumerate(hits):
            rows_t = rows_cat[:, k * n:(k + 1) * n]
            block = jnp.concatenate([
                rows_t,
                hid.astype(jnp.float32)[None, :],
                hu[None, :], hv[None, :],
            ], axis=0)                                     # (HIT_ROWS, n)
            if n_pad != n:
                fill = jnp.zeros((HIT_ROWS, n_pad - n), jnp.float32)
                fill = fill.at[ROW_ID].set(-1.0)
                block = jnp.concatenate([block, fill], axis=1)
            hits_p.append(block.reshape(HIT_ROWS, n_rows, LANES))
        payloads = ()

    o_comps = tuple(
        pad1(ro[:, k], 0.0).reshape(n_rows, LANES) for k in range(3))
    d_comps = tuple(
        pad1(rd[:, k], 1.0).reshape(n_rows, LANES) for k in range(3))
    lane2 = pad1(lane_flat.astype(jnp.uint32), 0).reshape(n_rows, LANES)
    act2 = pad1(act_flat.astype(jnp.int32), 0).reshape(n_rows, LANES)

    r_, g_, b_ = _shade(
        depth, cnt0, hide_emitters, interpret,
        tuple(hits_p), payloads, light, misc, o_comps, d_comps, lane2, act2,
        jnp.asarray(seed, jnp.uint32),
    )
    out = jnp.stack(
        [c.reshape(-1)[:n] for c in (r_, g_, b_)], axis=-1)
    return out.reshape(active.shape + (3,))
