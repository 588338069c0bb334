"""Pallas TPU megakernel: full detached path-traced Li in ONE kernel.

The reference's speed story is megakernel fusion — drjit traces the whole
``Li`` (intersect + NEE + BSDF + MIS per bounce) into one fused CUDA kernel
flushed at ``integrator.cpp:98``.  Our XLA formulation splits the same math
over ~1900 small fusions plus 7 separate intersection-kernel launches per
Li, and the device profile pins the primary-edge pass (two detached Li per
lane) at 231 ms of the ~600 ms full step (docs/PERFORMANCE.md).  This
module hand-fuses the *detached* Li — ray gen, cluster-culled
Möller-Trumbore sweep, hit-attribute resolve, area-light NEE with MIS,
cosine BSDF bounce — into one Pallas kernel that keeps every intermediate
in VMEM.

Scope (falls back to the general XLA path otherwise — checked statically
by :func:`applicable`):

* every mesh BSDF is a one-sided ``DiffuseBSDF`` with a constant (1x1)
  reflectance,
* exactly one emitter, an ``AreaLight`` with constant radiance,
* scene fits the small-scene SMEM regime (≤ ``MEGA_MAX_TRIS`` triangles).

This covers the README/BASELINE cbox benchmark class; textured/microfacet/
envmap scenes keep the general path.  The kernel is primal-only: it is used
exactly where the math is detached (the boundary-term Li evaluations,
``integrator.cpp:185-186``, and primal ``renderC``), never under AD.

Hit-attribute fetch uses a second cluster-culled sweep with masked selects
instead of gathers: per-lane dynamic indexing of VMEM/SMEM is impossible
on the VPU (ops/bvh.py notes), and shared-table gathers serialize through
SMEM in-context (CLAUDE.md).  Per-triangle scalar math (face normals,
attribute loads) runs once per *triangle*, the per-lane cost is one compare
plus ~12 selects — ~1/3 of the intersection sweep's ALU.

Sampler parity: draws replicate ``core.sampler.Sampler`` exactly —
``pcg4d(lane, cnt, seed, SALT)`` with the same static cnt schedule — so a
megakernel render is sample-for-sample the estimator the XLA path computes
(identical up to fp reassociation).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import EPSILON, SHADOW_EPSILON, INV_PI, PI
from ..core.sampler import pcg4d, _u32_to_unit_float
from .intersect_pallas import sweep_block, CLUSTER_SMALL, LANES

_INF = 1e30
_TINY = 1e-20
_SALT = 0x9E3779B9

# SMEM budget: the megakernel stages 9 geometry + 17 attribute scalars per
# triangle plus the light table; scalar prefetch spills SMEM around ~700
# triangles at 9 scalars/tri (1000x collapse, ops/intersect_pallas.py), so
# the cutoff scales that observation to ~26 scalars/tri.
MEGA_MAX_TRIS = 192
R_ROWS_MEGA = 64          # rays per tile row block (tune: VMEM pressure)

_ATTR_ROWS = 17  # n0(3) n1(3) n2(3) fnmask alb(3) emit(3) is_em
_LIGHT_ROWS = 14  # cdf pmf p0(3) e1(3) e2(3) fn(3)

# PSDR_MEGA: "auto" (TPU only), "interpret" (CPU tests via the Pallas
# interpreter), "0"/"off" (always fall back to the general XLA Li).
MEGA_MODE = _os.environ.get("PSDR_MEGA", "auto")


def enabled():
    """-> (use_megakernel, interpret_flag) for the current backend."""
    if MEGA_MODE in ("0", "off"):
        return False, False
    if MEGA_MODE == "interpret":
        return True, True
    return jax.default_backend() == "tpu", False


def _safe_div(a, b):
    safe_b = jnp.where(jnp.abs(b) > _TINY, b, 1.0)
    return jnp.where(jnp.abs(b) > _TINY, a / safe_b, 0.0)


def _safe_sqrt(x):
    return jnp.where(x > 0.0, jnp.sqrt(jnp.maximum(x, _TINY)), 0.0)


def _mis_weight(p1, p2):
    w1 = jnp.square(p1)
    w2 = jnp.square(p2)
    return _safe_div(w1, w1 + w2)


def _normalize3(x, y, z):
    n2 = x * x + y * y + z * z
    inv = jnp.where(n2 > 0.0, jax.lax.rsqrt(jnp.maximum(n2, _TINY)), 0.0)
    return x * inv, y * inv, z * inv


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sincos_pio4(phi):
    """sin/cos for |phi| <= pi/4 (matches warp._sincos_pio4 usage)."""
    return jnp.sin(phi), jnp.cos(phi)


def _cosine_hemisphere(u0, u1):
    """Concentric-disk cosine hemisphere (core/warp.py:30-51), per-lane."""
    x = 2.0 * u0 - 1.0
    y = 2.0 * u1 - 1.0
    q13 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(q13, y, x)
    rp = jnp.where(q13, x, y)
    s, c = _sincos_pio4(0.25 * PI * _safe_div(rp, r))
    cos_phi = jnp.where(q13, s, c)
    sin_phi = jnp.where(q13, c, s)
    px = r * cos_phi
    py = r * sin_phi
    z = _safe_sqrt(1.0 - px * px - py * py)
    return px, py, z


def _duff_frame(nx, ny, nz):
    """Duff et al. ONB (core/types.py:173-186). Returns (s, t) 3-tuples."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    s = (sign * nx * nx * a + 1.0, sign * b, -sign * nx)
    t = (b, sign + ny * ny * a, -ny)
    return s, t


def _mk_kernel(f_pad: int, n_clusters: int, n_light: int, depth: int,
               cnt0: int, hide_emitters: bool, stash: bool = False,
               pair: bool = False):
    """Build the Li kernel body for a static scene/loop configuration.

    ``stash=True`` (the interior-megakernel trace pass, ops/shade_mega.py):
    additionally writes each intersection's ``(tri_id, u, v)`` payload to
    extra out refs (camera, then per depth NEE + bounce), and rolls the
    bounce hit point via the BILINEAR reconstruction ``p0 + e1*u + e2*v``
    instead of ``o + t*d`` — matching the XLA path-space formulation
    (scene.py ray_intersect mode="path") sample-for-sample, so the attached
    shading recompute sees exactly the hit set the general path would.

    ``pair=True`` (the primary-edge pass, integrator/base.py): the kernel
    takes TWO rays per lane (ray_n then ray_p, the two sides of a screen
    edge) and writes ``Li(ray_n) - Li(ray_p)`` — the radiance difference of
    reference integrator.cpp:185-186 — in ONE launch.  ray_n consumes draw
    counters ``cnt0 .. cnt0+2*depth-1`` and ray_p the next ``2*depth``,
    exactly the two sequential Li calls' sampler schedule, so the delta is
    sample-for-sample the subtraction of two single-ray launches."""

    def kernel(tri_ref, box_ref, attr_ref, light_ref, misc_ref, seed_ref,
               lane, act, *ray_refs_and_outs):
        n_ray_comps = 12 if pair else 6
        ray_comp_refs = ray_refs_and_outs[:n_ray_comps]
        out_r, out_g, out_b = ray_refs_and_outs[
            n_ray_comps:n_ray_comps + 3]
        stash_refs = ray_refs_and_outs[n_ray_comps + 3:]
        ox, oy, oz, dx, dy, dz = ray_comp_refs[:6]
        shape = ox[...].shape
        lane_u = lane[...]
        seed_b = jnp.full(shape, seed_ref[0], jnp.uint32)
        salt_b = jnp.full(shape, _SALT, jnp.uint32)
        total_mass = misc_ref[0]
        inv_area = misc_ref[1]

        def draw(cnt):
            c = jnp.full(shape, cnt, jnp.uint32)
            v = pcg4d(lane_u, c, seed_b, salt_b)
            return tuple(_u32_to_unit_float(u) for u in v)

        def closest_hit(o, d):
            init = (
                jnp.full(shape, _INF, jnp.float32),
                jnp.full(shape, -1, jnp.int32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
            )
            bt, bi, bu, bv = sweep_block(
                lambda ch, j: tri_ref[ch, j], lambda ch, c: box_ref[ch, c],
                (o[0], o[1], o[2], d[0], d[1], d[2]), 0, CLUSTER_SMALL,
                n_clusters, init,
            )
            return bt, jnp.where(bt < _INF, bi, -1), bu, bv

        def resolve(bi, bu, bv, want_p: bool = False):
            """Masked-select attribute fetch for hit ids (no gathers).

            Returns (ns(3), fn(3), alb(3), is_em) of the hit triangle
            (plus the bilinear hit point when ``want_p``); zeros for misses
            (bi < 0).
            """
            zero = jnp.zeros(shape, jnp.float32)
            init = (zero,) * 9 + (zero,)
            if want_p:
                init = init + (zero, zero, zero)

            def tri_body(j, carry):
                m = bi == j
                # shading normal: per-tri scalars, per-lane interpolation
                # (scene.py ray_intersect:186-187)
                n0x = attr_ref[0, j]
                n0y = attr_ref[1, j]
                n0z = attr_ref[2, j]
                fnmask = attr_ref[9, j] > 0.5
                # face normal from the geometry scalars (normalize of
                # cross(e1, e2) — shape/mesh.py:148), scalar math
                e1x = tri_ref[3, j]
                e1y = tri_ref[4, j]
                e1z = tri_ref[5, j]
                e2x = tri_ref[6, j]
                e2y = tri_ref[7, j]
                e2z = tri_ref[8, j]
                fx = e1y * e2z - e1z * e2y
                fy = e1z * e2x - e1x * e2z
                fz = e1x * e2y - e1y * e2x
                fn2 = fx * fx + fy * fy + fz * fz
                finv = jnp.where(fn2 > 0.0,
                                 jax.lax.rsqrt(jnp.maximum(fn2, _TINY)), 0.0)
                fx, fy, fz = fx * finv, fy * finv, fz * finv
                if_smooth = jnp.logical_not(fnmask)
                nx = jnp.where(
                    if_smooth,
                    n0x + (attr_ref[3, j] - n0x) * bu
                    + (attr_ref[6, j] - n0x) * bv, fx)
                ny = jnp.where(
                    if_smooth,
                    n0y + (attr_ref[4, j] - n0y) * bu
                    + (attr_ref[7, j] - n0y) * bv, fy)
                nz = jnp.where(
                    if_smooth,
                    n0z + (attr_ref[5, j] - n0z) * bu
                    + (attr_ref[8, j] - n0z) * bv, fz)
                (cnx, cny, cnz, cfx, cfy, cfz, car, cag, cab, cem
                 ) = carry[:10]
                cnx = jnp.where(m, nx, cnx)
                cny = jnp.where(m, ny, cny)
                cnz = jnp.where(m, nz, cnz)
                cfx = jnp.where(m, fx, cfx)
                cfy = jnp.where(m, fy, cfy)
                cfz = jnp.where(m, fz, cfz)
                car = jnp.where(m, attr_ref[10, j], car)
                cag = jnp.where(m, attr_ref[11, j], cag)
                cab = jnp.where(m, attr_ref[12, j], cab)
                cem = jnp.where(m, attr_ref[16, j], cem)
                out = (cnx, cny, cnz, cfx, cfy, cfz, car, cag, cab, cem)
                if want_p:
                    # bilinear hit point p0 + e1*u + e2*v (math.py:78-80)
                    cpx, cpy, cpz = carry[10:]
                    p0x = tri_ref[0, j]
                    p0y = tri_ref[1, j]
                    p0z = tri_ref[2, j]
                    cpx = jnp.where(m, p0x + e1x * bu + e2x * bv, cpx)
                    cpy = jnp.where(m, p0y + e1y * bu + e2y * bv, cpy)
                    cpz = jnp.where(m, p0z + e1z * bu + e2z * bv, cpz)
                    out = out + (cpx, cpy, cpz)
                return out

            def cluster_body(c, carry):
                lo = c * CLUSTER_SMALL
                hi = lo + CLUSTER_SMALL
                any_in = jnp.any((bi >= lo) & (bi < hi))
                return jax.lax.cond(
                    any_in,
                    lambda cr: jax.lax.fori_loop(lo, hi, tri_body, cr),
                    lambda cr: cr, carry,
                )

            res = jax.lax.fori_loop(0, n_clusters, cluster_body, init)
            (nx, ny, nz, fx, fy, fz, ar, ag, ab, em) = res[:10]
            nx, ny, nz = _normalize3(nx, ny, nz)
            # emit radiance rides in rows 13-15 only for emissive tris;
            # resolve it from the same sweep carries (is_em scales it)
            base = ((nx, ny, nz), (fx, fy, fz), (ar, ag, ab), em > 0.5)
            if want_p:
                return base + (res[10:],)
            return base

        def resolve_emit(bi):
            """Emitted radiance scalars of the hit triangle (rows 13-15)."""
            zero = jnp.zeros(shape, jnp.float32)
            init = (zero, zero, zero)

            def tri_body(j, carry):
                m = bi == j
                return (
                    jnp.where(m, attr_ref[13, j], carry[0]),
                    jnp.where(m, attr_ref[14, j], carry[1]),
                    jnp.where(m, attr_ref[15, j], carry[2]),
                )

            def cluster_body(c, carry):
                lo = c * CLUSTER_SMALL
                any_in = jnp.any((bi >= lo) & (bi < lo + CLUSTER_SMALL))
                return jax.lax.cond(
                    any_in,
                    lambda cr: jax.lax.fori_loop(
                        lo, lo + CLUSTER_SMALL, tri_body, cr),
                    lambda cr: cr, carry,
                )

            return jax.lax.fori_loop(0, n_clusters, cluster_body, init)

        def sample_light(u0, u1):
            """Uniform-area sample of the emitter mesh with sample reuse
            (shape/mesh.py sample_position; pmf.cpp:30-51)."""
            scaled = u0 * total_mass
            zero = jnp.zeros(shape, jnp.float32)
            # running index = count of cdf entries < scaled
            idx = jnp.zeros(shape, jnp.int32)
            for j in range(n_light):
                idx = idx + (light_ref[0, j] < scaled).astype(jnp.int32)
            idx = jnp.minimum(idx, n_light - 1)
            lower = zero
            pmf = jnp.zeros(shape, jnp.float32)
            p0 = [zero, zero, zero]
            e1 = [zero, zero, zero]
            e2 = [zero, zero, zero]
            fn = [zero, zero, zero]
            for j in range(n_light):
                m = idx == j
                lower = jnp.where(m, 0.0 if j == 0 else light_ref[0, j - 1],
                                  lower)
                pmf = jnp.where(m, light_ref[1, j], pmf)
                for k in range(3):
                    p0[k] = jnp.where(m, light_ref[2 + k, j], p0[k])
                    e1[k] = jnp.where(m, light_ref[5 + k, j], e1[k])
                    e2[k] = jnp.where(m, light_ref[8 + k, j], e2[k])
                    fn[k] = jnp.where(m, light_ref[11 + k, j], fn[k])
            u0r = jnp.clip(_safe_div(scaled - lower, pmf), 0.0, 1.0)
            # square_to_uniform_triangle (core/warp.py:59-62)
            tq = _safe_sqrt(1.0 - u0r)
            b0 = 1.0 - tq
            b1 = tq * u1
            pl_ = tuple(p0[k] + e1[k] * b0 + e2[k] * b1 for k in range(3))
            return pl_, tuple(fn)

        def put_stash(k, hid, hu, hv):
            stash_refs[3 * k][...] = hid
            stash_refs[3 * k + 1][...] = hu
            stash_refs[3 * k + 2][...] = hv

        # ---- Li --------------------------------------------------------
        def eval_li(o, d, active, cnt):
            t, bi, bu, bv = closest_hit(o, d)
            if stash:
                put_stash(0, bi, bu, bv)
            valid = bi >= 0
            active = active & valid
            ns, fn, alb, is_em = resolve(bi, bu, bv)

            res_r = jnp.zeros(shape, jnp.float32)
            res_g = jnp.zeros(shape, jnp.float32)
            res_b = jnp.zeros(shape, jnp.float32)
            if not hide_emitters:
                # Le at the camera hit: one-sided constant radiance
                # (area.cpp:17-26): wi_local.z = dot(ns, -d)
                wiz = -_dot3(ns, d)
                ok = active & is_em & (wiz > 0.0)
                er, eg, eb = resolve_emit(bi)
                res_r = jnp.where(ok, er, res_r)
                res_g = jnp.where(ok, eg, res_g)
                res_b = jnp.where(ok, eb, res_b)

            thr_r = jnp.ones(shape, jnp.float32)
            thr_g = jnp.ones(shape, jnp.float32)
            thr_b = jnp.ones(shape, jnp.float32)

            # camera hit point o + t*d (solid formulation); bounce hits
            # roll either o + t*d (mega Li) or the bilinear point (stash)
            p = tuple(o[k] + d[k] * t for k in range(3))
            for _depth in range(depth):
                wiz_cam = -_dot3(ns, d)  # cos_i at this hit (local wi.z)

                # ---- NEE (path.cpp:47-83) --------------------------------
                u_nee = draw(cnt)
                cnt += 1
                # (the light's own normal is unused: the NEE geometry term reads
                # the SHADOW HIT's face normal, path.cpp:62 via scene.cpp)
                pl_, _nl = sample_light(u_nee[0], u_nee[1])
                ps_pdf = jnp.full(shape, inv_area, jnp.float32)
                active_direct = active & jnp.logical_not(is_em)
                wod = tuple(pl_[k] - p[k] for k in range(3))
                dist_sqr = _dot3(wod, wod)
                dist = _safe_sqrt(dist_sqr)
                inv_dist = _safe_div(1.0, dist)
                wod = tuple(wod[k] * inv_dist for k in range(3))
                t1, bi1, bu1, bv1 = closest_hit(p, wod)
                if stash:
                    put_stash(1 + 2 * _depth, bi1, bu1, bv1)
                ns1, fn1, _alb1, is_em1 = resolve(bi1, bu1, bv1)
                hit_light = (
                    active_direct & (bi1 >= 0)
                    & (t1 > dist - SHADOW_EPSILON) & is_em1
                )
                cos_val = -_dot3(fn1, wod)
                g_val = _safe_div(jnp.abs(cos_val), dist_sqr)
                # emitter_val = Le(its1): one-sided wrt its1 shading normal
                wiz1 = -_dot3(ns1, wod)
                le_ok = (bi1 >= 0) & is_em1 & (wiz1 > 0.0)
                er, eg, eb = resolve_emit(bi1)
                er = jnp.where(le_ok, er, 0.0)
                eg = jnp.where(le_ok, eg, 0.0)
                eb = jnp.where(le_ok, eb, 0.0)
                # diffuse eval at wo_local.z = dot(ns, wod) (diffuse.cpp:24-40)
                cos_o = _dot3(ns, wod)
                f_ok = (wiz_cam > 0.0) & (cos_o > 0.0)
                f_scale = jnp.where(f_ok, INV_PI * cos_o, 0.0)
                w_nee = g_val * _safe_div(1.0, ps_pdf)
                pdf1 = jnp.where(f_ok, INV_PI * cos_o, 0.0) * g_val
                ok_nee = hit_light & (pdf1 != 0.0)
                weight1 = _mis_weight(ps_pdf, pdf1)
                scale = jnp.where(ok_nee, f_scale * w_nee * weight1, 0.0)
                res_r = res_r + thr_r * alb[0] * er * scale
                res_g = res_g + thr_g * alb[1] * eg * scale
                res_b = res_b + thr_b * alb[2] * eb * scale

                # ---- BSDF bounce (path.cpp:85-123) -----------------------
                u_b = draw(cnt)
                cnt += 1
                lx, ly, lz = _cosine_hemisphere(u_b[1], u_b[2])
                bs_pdf = INV_PI * lz
                s_f, t_f = _duff_frame(ns[0], ns[1], ns[2])
                wo = tuple(
                    s_f[k] * lx + t_f[k] * ly + ns[k] * lz for k in range(3)
                )
                bs_valid = active & (wiz_cam > 0.0)
                t2, bi2, bu2, bv2 = closest_hit(p, wo)
                if stash:
                    put_stash(2 + 2 * _depth, bi2, bu2, bv2)
                valid2 = bi2 >= 0
                active = bs_valid & valid2
                if stash:
                    ns2, fn2, alb2, is_em2, p2_bl = resolve(
                        bi2, bu2, bv2, want_p=True)
                else:
                    ns2, fn2, alb2, is_em2 = resolve(bi2, bu2, bv2)
                cos_val2 = -_dot3(fn2, wo)
                g2 = _safe_div(jnp.abs(cos_val2), jnp.maximum(t2 * t2, _TINY))
                g2 = jnp.where(valid2, g2, 1.0)
                pdf0 = bs_pdf * g2
                # detached diffuse: eval/pdf = albedo (cosine cancellation),
                # masked like the general path (wi.z>0 & wo.z>0, t>eps)
                f2_ok = (wiz_cam > 0.0) & (lz > 0.0) & (t2 >= EPSILON)
                bw = jnp.where(f2_ok & active, 1.0, 0.0)
                thr_r = thr_r * alb[0] * bw
                thr_g = thr_g * alb[1] * bw
                thr_b = thr_b * alb[2] * bw
                # MIS against NEE for the emitter hit
                e_pdf = jnp.where((bi2 >= 0) & is_em2, inv_area, 0.0)
                weight2 = _mis_weight(pdf0, e_pdf)
                wiz2 = -_dot3(ns2, wo)
                le2_ok = active & is_em2 & (wiz2 > 0.0)
                er2, eg2, eb2 = resolve_emit(bi2)
                lscale = jnp.where(le2_ok, weight2, 0.0)
                res_r = res_r + thr_r * er2 * lscale
                res_g = res_g + thr_g * eg2 * lscale
                res_b = res_b + thr_b * eb2 * lscale

                # roll state for the next bounce.  p + wo*t2 is the exact
                # expression tree the pre-refactor `o + d*t` built (o=p, d=wo,
                # t=t2) — bitwise identical; stash mode rolls the bilinear
                # point to match the XLA path-space reconstruction instead.
                if stash:
                    p = p2_bl
                else:
                    p = tuple(p[k] + wo[k] * t2 for k in range(3))
                d = wo
                ns, fn, alb, is_em = ns2, fn2, alb2, is_em2

            return res_r, res_g, res_b

        act_b = act[...] > 0
        o = (ox[...], oy[...], oz[...])
        d0 = (dx[...], dy[...], dz[...])
        if pair:
            oxp, oyp, ozp, dxp, dyp, dzp = ray_comp_refs[6:]
            rn = eval_li(o, d0, act_b, cnt0)
            rp = eval_li(
                (oxp[...], oyp[...], ozp[...]),
                (dxp[...], dyp[...], dzp[...]), act_b, cnt0 + 2 * depth)
            out_r[...] = rn[0] - rp[0]
            out_g[...] = rn[1] - rp[1]
            out_b[...] = rn[2] - rp[2]
        else:
            res_r, res_g, res_b = eval_li(o, d0, act_b, cnt0)
            out_r[...] = res_r
            out_g[...] = res_g
            out_b[...] = res_b

    return kernel


def applicable(sd) -> bool:
    """Static check: can the megakernel evaluate this scene's detached Li?

    All conditions are trace-static (types, shapes, flags), so the decision
    never changes between calls with the same SceneData treedef.
    """
    from ..bsdf.diffuse import DiffuseBSDF
    from ..emitter.area import AreaLightData

    if sd.tri.p0.shape[0] > MEGA_MAX_TRIS:
        return False
    if len(sd.emitters) != 1 or not isinstance(sd.emitters[0], AreaLightData):
        return False
    for b in sd.bsdfs:
        if not isinstance(b, DiffuseBSDF):
            return False
        if b.twoSide:
            return False
        res = getattr(b.reflectance, "resolution", None)
        if res != (1, 1):
            return False
    return True


def build_tables(sd):
    """Pack SceneData into the kernel's SMEM scalar tables (traced, cheap:
    everything is O(F) with F <= MEGA_MAX_TRIS)."""
    tri = sd.tri
    f = tri.p0.shape[0]
    f_pad = -(-f // CLUSTER_SMALL) * CLUSTER_SMALL

    def pad(x):
        if x.shape[0] != f_pad:
            x = jnp.pad(x, ((0, f_pad - x.shape[0]),) + ((0, 0),) *
                        (x.ndim - 1))
        return x

    p0, e1, e2 = pad(tri.p0), pad(tri.e1), pad(tri.e2)
    tri_tab = jnp.concatenate([p0.T, e1.T, e2.T], axis=0)  # (9, f_pad)

    nc = f_pad // CLUSTER_SMALL
    v0 = p0.reshape(nc, CLUSTER_SMALL, 3)
    v1 = (p0 + e1).reshape(nc, CLUSTER_SMALL, 3)
    v2 = (p0 + e2).reshape(nc, CLUSTER_SMALL, 3)
    lo = jnp.minimum(jnp.minimum(v0.min(1), v1.min(1)), v2.min(1))
    hi = jnp.maximum(jnp.maximum(v0.max(1), v1.max(1)), v2.max(1))
    box_tab = jnp.concatenate([lo.T, hi.T], axis=0)  # (6, nc)

    # per-tri attributes: mesh-indexed lookups are tiny (F rows, once per
    # step, outside the hot loop)
    bslot = sd.mesh_bsdf_slot[sd.face_mesh_id]          # (F,)
    alb_table = jnp.stack([
        jax.lax.stop_gradient(b.reflectance.data.reshape(3))
        for b in sd.bsdfs
    ])                                                   # (B, 3)
    alb = jnp.where(
        (bslot >= 0)[:, None],
        alb_table[jnp.maximum(bslot, 0)], 0.0)
    eslot = sd.mesh_emitter_slot[sd.face_mesh_id]
    is_em = (eslot >= 0).astype(jnp.float32)
    em = sd.emitters[0]
    emit = jnp.where(
        (eslot >= 0)[:, None],
        jax.lax.stop_gradient(em.radiance).reshape(1, 3), 0.0)
    attr = jnp.concatenate([
        pad(tri.n0).T, pad(tri.n1).T, pad(tri.n2).T,
        pad(sd.face_normal_mask.astype(jnp.float32)[:, None]).T,
        pad(alb).T, pad(emit).T, pad(is_em[:, None]).T,
    ], axis=0)  # (17, f_pad)
    attr = jax.lax.stop_gradient(attr)

    # light table from the emitter mesh (uniform-by-area sampling)
    md = em.mesh_data
    ltri = md.tri
    lcdf = md.face_distrb.cdf
    lpmf = md.face_distrb.pmf
    lfn = ltri.face_normal
    light = jnp.concatenate([
        lcdf[None, :], lpmf[None, :], ltri.p0.T, ltri.e1.T, ltri.e2.T,
        lfn.T,
    ], axis=0)  # (14, L)
    light = jax.lax.stop_gradient(light)

    misc = jax.lax.stop_gradient(jnp.stack([
        md.face_distrb.total,
        em.sampling_weight * _safe_div(1.0, md.total_area),
    ]))
    return tri_tab, box_tab, attr, light, misc


def _li_mega_impl(tri_tab, box_tab, attr, light, misc, ray_o, ray_d, active,
                  lane, seed, depth: int, cnt0: int, hide_emitters: bool,
                  interpret: bool, stash: bool, ray2: tuple = None):
    n = ray_o.shape[0]
    f_pad = tri_tab.shape[1]
    n_clusters = f_pad // CLUSTER_SMALL
    n_light = light.shape[1]
    tile = R_ROWS_MEGA * LANES
    n_pad = -(-n // tile) * tile
    pair = ray2 is not None

    def pad_ray(x, fill):
        if n_pad != n:
            x = jnp.concatenate(
                [x, jnp.full((n_pad - n,), fill, x.dtype)], axis=0)
        return x.reshape(n_pad // LANES, LANES)

    comps = (
        [pad_ray(lane.astype(jnp.uint32), 0),
         pad_ray(active.astype(jnp.int32), 0)]
        + [pad_ray(ray_o[:, i], 0.0) for i in range(3)]
        + [pad_ray(ray_d[:, i], 1.0) for i in range(3)]
    )
    if pair:
        comps += (
            [pad_ray(ray2[0][:, i], 0.0) for i in range(3)]
            + [pad_ray(ray2[1][:, i], 1.0) for i in range(3)]
        )
    n_rows = n_pad // LANES
    grid = (n_rows // R_ROWS_MEGA,)
    ray_spec = pl.BlockSpec(
        (R_ROWS_MEGA, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    n_hits = (1 + 2 * depth) if stash else 0
    out_shape = [jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)] * 3
    for _ in range(n_hits):
        out_shape += [
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[ray_spec] * len(comps),
        out_specs=[ray_spec] * len(out_shape),
    )
    out = pl.pallas_call(
        _mk_kernel(f_pad, n_clusters, n_light, depth, cnt0, hide_emitters,
                   stash=stash, pair=pair),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tri_tab, box_tab, attr, light, misc,
      jnp.asarray(seed, jnp.uint32).reshape(1), *comps)
    li = jnp.stack([c.reshape(-1)[:n] for c in out[:3]], axis=-1)
    if not stash:
        return li
    hits = tuple(
        tuple(c.reshape(-1)[:n] for c in out[3 + 3 * k: 6 + 3 * k])
        for k in range(n_hits)
    )
    return li, hits


@functools.partial(
    jax.jit,
    static_argnames=("depth", "cnt0", "hide_emitters", "interpret"),
)
def li_mega(tri_tab, box_tab, attr, light, misc, ray_o, ray_d, active, lane,
            seed, depth: int, cnt0: int, hide_emitters: bool = False,
            interpret: bool = False):
    """Detached PathTracer Li for (N, 3) rays — one Pallas launch.

    ``lane``/``seed``/``cnt0`` replicate the XLA path's Sampler schedule
    (one pcg4d draw per NEE + one per bounce, starting at ``cnt0``).
    Returns ``(N, 3)`` radiance; inactive lanes are 0.
    """
    return _li_mega_impl(tri_tab, box_tab, attr, light, misc, ray_o, ray_d,
                         active, lane, seed, depth, cnt0, hide_emitters,
                         interpret, stash=False)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "cnt0", "hide_emitters", "interpret"),
)
def li_mega_pair(tri_tab, box_tab, attr, light, misc, ray_o_n, ray_d_n,
                 ray_o_p, ray_d_p, active, lane, seed, depth: int, cnt0: int,
                 hide_emitters: bool = False, interpret: bool = False):
    """``Li(ray_n) - Li(ray_p)`` for (N, 3) ray pairs — ONE Pallas launch.

    The primary-edge boundary term needs only the detached radiance
    DIFFERENCE across each screen edge (reference integrator.cpp:185-186,
    one fused drjit kernel evaluating both sides).  Evaluating both Li in
    one kernel halves launch count and per-launch fixed costs vs two
    ``li_mega`` calls; ray_n consumes draw counters ``cnt0..cnt0+2*depth-1``
    and ray_p the next ``2*depth``, exactly the two sequential calls'
    sampler schedule, so the result equals their subtraction.
    """
    return _li_mega_impl(tri_tab, box_tab, attr, light, misc, ray_o_n,
                         ray_d_n, active, lane, seed, depth, cnt0,
                         hide_emitters, interpret, stash=False,
                         ray2=(ray_o_p, ray_d_p))


def li_mega_stash(tri_tab, box_tab, attr, light, misc, ray_o, ray_d, active,
                  lane, seed, depth: int, cnt0: int,
                  hide_emitters: bool = False, interpret: bool = False):
    """Detached Li + the per-intersection hit payloads, one Pallas launch.

    Returns ``(li (N, 3), hits)`` where ``hits`` is a tuple of
    ``(tri_id (N,) int32, u (N,), v (N,))`` for the camera hit followed by
    each depth's NEE shadow hit and BSDF bounce hit (1 + 2*depth entries).
    Secondary origins use the bilinear reconstruction, matching the XLA
    path-space hit chain (scene.py ray_intersect mode="path") so the
    attached shading recompute (ops/shade_mega.py) replays exactly this
    path.  Callers jit; draws replicate the Sampler schedule like li_mega.
    """
    return _li_mega_impl(tri_tab, box_tab, attr, light, misc, ray_o, ray_d,
                         active, lane, seed, depth, cnt0, hide_emitters,
                         interpret, stash=True)
