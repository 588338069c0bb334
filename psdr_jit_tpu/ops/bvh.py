"""TPU-native acceleration structure: sorted-ray, block-culled intersection.

The reference's OptiX GAS (scene_optix.cpp:265-333) gives each CUDA thread a
divergent per-ray BVH traversal.  That shape is hostile to the TPU: lanes
cannot dynamically index VMEM, so a per-lane node stack cannot exist.  The
TPU-native equivalent keeps all hierarchy decisions at *tile* granularity,
where they are scalar-uniform and free:

1. **Ray coherence by sorting** (`sort_rays`): rays are ordered by
   (direction octant, origin Morton, direction Morton) with two
   ``lax.sort`` calls (sort + inverse permutation).  After sorting, a tile
   of consecutive rays shares a tight origin box and a sign-consistent
   direction interval — the precondition for useful tile-level culling of
   incoherent workloads.
2. **Tile-vs-block traversal in XLA** (`tile_block_visit`): triangles are
   Morton-ordered into 512-triangle super-blocks with AABBs (the scene
   layer already does this); a conservative interval-arithmetic slab test
   marks which blocks each ray tile can possibly hit.  At
   10^5-10^6 triangles this is a few hundred blocks x a few hundred tiles —
   dense XLA math, no tree needed; the "traversal" is one fused op.
3. **Data-dependent block streaming in Pallas** (`_call_indexed`): the
   kernel's grid walks (tile, k) and the BlockSpec ``index_map`` reads the
   per-tile fetch list from scalar-prefetch memory, so each tile DMAs only
   the super-blocks it can hit, in order; closest-hit state lives in the
   revisited output blocks exactly like the dense streaming kernel.
   Padding entries repeat the previous block index (the pipeline skips the
   re-fetch) and are masked with ``pl.when``.

Same payload contract as everything else: ``(tri_id, valid, uv, t)``
(scene_optix.cpp:400-404).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import RAY_EPSILON

import os as _os

_INF = 1e30
LANES = 128
SUPER = 512          # triangles per streamed block (matches intersect_pallas)
CLUSTER = 64         # cluster granularity inside a block
# rays per tile = TILE_ROWS * LANES; smaller tiles cull tighter but pay more
# grid-step overhead (sweepable for experiments)
TILE_ROWS = int(_os.environ.get("PSDR_BVH_TILE_ROWS", "64"))
# A/B knobs, read at TRACE time (scripts/gallery_ab.py re-jits per variant):
# disable the front-to-back early-out / dead-lane parking to measure each
EARLY_OUT = _os.environ.get("PSDR_BVH_EARLYOUT", "1") != "0"
PARK_DEAD = _os.environ.get("PSDR_BVH_PARK", "1") != "0"
# Guaranteed-occluder proxy pre-pass (the t-bound lever, VERDICT r3 #7):
# densely sweep the N largest-area triangles first; every hit is a REAL
# hit, so its t upper-bounds the closest hit.  The indexed kernel starts
# from that state instead of (INF, -1) and — unlike the in-kernel
# early-out, which only skips ALU after the DMA already happened — blocks
# whose conservative entry exceeds every lane's bound are dropped from the
# fetch list in XLA, cutting DMA and grid steps.  In a closed room
# (gallery class) the few big wall/floor triangles bound every ray.
# 0 = off.
PROXY_TRIS = int(_os.environ.get("PSDR_BVH_PROXY", "0"))


# ---------------------------------------------------------------------------
# 1. Ray sorting
# ---------------------------------------------------------------------------

def _expand_bits10(v):
    """Spread the low 10 bits of ``v`` so consecutive bits are 3 apart."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _morton10(p, lo, inv_extent):
    """30-bit Morton code of points ``p`` (N, 3) within [lo, lo+extent]."""
    q = jnp.clip((p - lo) * inv_extent, 0.0, 1.0 - 1e-7)
    cell = (q * 1024.0).astype(jnp.uint32)
    return (
        _expand_bits10(cell[:, 0])
        | (_expand_bits10(cell[:, 1]) << 1)
        | (_expand_bits10(cell[:, 2]) << 2)
    )


def _ray_sort_keys(ray_o, ray_d):
    """Sort keys ordering rays by (direction octant + coarse origin cell,
    direction Morton, fine origin Morton).

    Key order matters for the tile culling bounds: sorting fine origin
    before direction gives tiles a tight origin box but a whole-octant
    direction cone (measured 3.8x on 100k-tri incoherent rays); putting a
    COARSE origin cell first and the direction next gives tiles both a
    moderate origin box AND a narrow cone, which the interval test turns
    into far fewer visited blocks."""
    octant = (
        (ray_d[:, 0] < 0).astype(jnp.uint32)
        | ((ray_d[:, 1] < 0).astype(jnp.uint32) << 1)
        | ((ray_d[:, 2] < 0).astype(jnp.uint32) << 2)
    )
    lo = jnp.min(ray_o, axis=0)
    extent = jnp.maximum(jnp.max(ray_o, axis=0) - lo, 1e-6)
    key_o = _morton10(ray_o, lo, 1.0 / extent)          # 30-bit fine origin
    coarse = key_o >> 21                                # top 3 bits/axis
    key_d = _morton10(jnp.abs(ray_d), jnp.zeros(3), jnp.ones(3))
    key1 = (octant << 9) | coarse
    return key1, key_d, key_o


def sort_rays_carry(ray_o, ray_d):
    """Sort rays, CARRYING the six components through the one lax.sort.

    Returns ``(perm, ray_o_sorted, ray_d_sorted)``.  Zero gathers: the
    components ride the key sort as extra operands, and the caller
    restores payload order with a second carrying sort keyed on ``perm``
    (see :func:`unsort_by`).  The former take(perm)/take(inv_perm)
    formulation spent 123 ms/step of the envmap workload in per-component
    permutation gathers (scripts/attribute_profile.py, 2026-08-19)."""
    n = ray_o.shape[0]
    key1, key_d, key_o = _ray_sort_keys(ray_o, ray_d)
    iota = jnp.arange(n, dtype=jnp.int32)
    (_, _, _, perm, ox, oy, oz, dx, dy, dz) = jax.lax.sort(
        (key1, key_d, key_o, iota,
         ray_o[:, 0], ray_o[:, 1], ray_o[:, 2],
         ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]),
        num_keys=3,
    )
    return perm, jnp.stack([ox, oy, oz], axis=-1), \
        jnp.stack([dx, dy, dz], axis=-1)


def unsort_by(perm, arrays):
    """Restore original order: one carrying sort keyed on ``perm`` (the
    original index of each sorted element) instead of N gathers."""
    out = jax.lax.sort((perm,) + tuple(arrays), num_keys=1)
    return out[1:]


def sort_rays(ray_o, ray_d):
    """(perm, inv_perm) view of the ray ordering — kept for tests and
    diagnostics; the entry point uses the gather-free carrying forms."""
    n = ray_o.shape[0]
    key1, key_d, key_o = _ray_sort_keys(ray_o, ray_d)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, _, _, perm = jax.lax.sort(
        (key1, key_d, key_o, iota), num_keys=3
    )
    # inverse permutation via one more sort (scatter has a ~30 ms fixed
    # cost on TPU; sort does not)
    _, inv_perm = jax.lax.sort((perm, iota), num_keys=1)
    return perm, inv_perm


# ---------------------------------------------------------------------------
# 2. Conservative tile-vs-block culling (the "traversal", fully in XLA)
# ---------------------------------------------------------------------------

def tile_block_visit(ray_o, ray_d, block_lo, block_hi, tile_rays: int):
    """(n_tiles, n_blocks) bool: can ANY ray of the tile hit the block AABB?

    Sound over-approximation by interval arithmetic: per tile keep origin
    box [o0, o1] and direction interval [d0, d1]; per axis the minimum
    possible slab entry / maximum possible exit over those intervals is the
    min/max over the 8 endpoint quotients (a direction interval containing
    zero makes the axis unconstrained)."""
    n = ray_o.shape[0]
    n_tiles = n // tile_rays
    o = ray_o[: n_tiles * tile_rays].reshape(n_tiles, tile_rays, 3)
    d = ray_d[: n_tiles * tile_rays].reshape(n_tiles, tile_rays, 3)
    o0, o1 = o.min(axis=1), o.max(axis=1)              # (T, 3)
    d0, d1 = d.min(axis=1), d.max(axis=1)

    def quot(num, den):
        # IEEE inf on den==0 is fine except 0/0; scrub those to +-inf
        q = num / den
        return jnp.where(jnp.isnan(q), jnp.where(num >= 0, _INF, -_INF), q)

    qs = []
    for bound in (block_lo, block_hi):                 # (B, 3)
        for ob in (o0, o1):                            # (T, 3)
            num = bound[None, :, :] - ob[:, None, :]   # (T, B, 3)
            for db in (d0, d1):                        # (T, 3)
                qs.append(quot(num, db[:, None, :]))
    qs = jnp.stack(qs)                                 # (8, T, B, 3)
    enter = jnp.min(qs, axis=0)
    exit_ = jnp.max(qs, axis=0)
    # an axis whose direction interval spans zero yields no slab constraint
    unconstrained = ((d0 <= 0.0) & (d1 >= 0.0))[:, None, :]
    enter = jnp.where(unconstrained, -_INF, enter)
    exit_ = jnp.where(unconstrained, _INF, exit_)
    t_near = jnp.maximum(jnp.max(enter, axis=-1), 0.0)  # (T, B)
    t_far = jnp.min(exit_, axis=-1)
    visit = (t_near <= t_far) & (t_far > 0.0)

    # Reachability refinement: even when an axis gives no slab constraint
    # (direction interval spans 0), travel is bounded by |d| * t over the
    # t window the OTHER axes allow.  Position interval at t in [tn, tf]:
    # [o0 + min(t*d), o1 + max(t*d)] over the (t, d) rectangle — must
    # overlap the block slab on every axis.  (Sound: true positions lie
    # inside the interval hull.)
    tf_c = jnp.minimum(t_far, _INF)[..., None]          # (T, B, 1)
    tn_c = t_near[..., None]
    td = jnp.stack([
        tn_c * d0[:, None, :], tn_c * d1[:, None, :],
        tf_c * d0[:, None, :], tf_c * d1[:, None, :],
    ])
    pos_lo = o0[:, None, :] + jnp.min(td, axis=0)
    pos_hi = o1[:, None, :] + jnp.max(td, axis=0)
    reach = (pos_hi >= block_lo[None, :, :]) & (pos_lo <= block_hi[None, :, :])
    return visit & jnp.all(reach, axis=-1), t_near


def build_fetch_list(visit, t_near=None):
    """(T, B) bool -> (fetch (T, B) int32, counts (T,) int32, tnear (T, B)
    f32): visited block indices first — FRONT-TO-BACK by conservative entry
    distance when ``t_near`` is given, so the kernel's closest-hit
    improvement test can skip far blocks — padding repeats the last visited
    block so the Pallas pipeline skips the redundant DMA.  ``tnear`` is the
    per-fetch-slot conservative entry distance (0 when unknown): once every
    ray of a tile holds a hit closer than slot k's entry, no later slot can
    improve it and the kernel skips the sweep (its DMA already happened —
    this saves the dominant ALU, not bandwidth)."""
    n_tiles, n_blocks = visit.shape
    if t_near is None:
        order = jnp.argsort(~visit, axis=1, stable=True).astype(jnp.int32)
    else:
        key = jnp.where(visit, jnp.maximum(t_near, 0.0), _INF)
        order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    counts = visit.sum(axis=1).astype(jnp.int32)
    k = jnp.arange(n_blocks, dtype=jnp.int32)[None, :]
    clamp = jnp.minimum(k, jnp.maximum(counts - 1, 0)[:, None])
    fetch = jnp.take_along_axis(order, clamp, axis=1)
    if t_near is None:
        tnear_slots = jnp.zeros(visit.shape, jnp.float32)
    else:
        tnear_slots = jnp.take_along_axis(
            jnp.maximum(t_near, 0.0), fetch, axis=1
        )
    return fetch, counts, tnear_slots


# ---------------------------------------------------------------------------
# 3. Indexed-streaming Pallas kernel
# ---------------------------------------------------------------------------

def _kernel_indexed(proxy: bool = False):
    from .intersect_pallas import sweep_block

    def kernel(fetch_ref, cnt_ref, tnear_ref, tri_ref, box_ref,
               ox, oy, oz, dx, dy, dz, *rest):
        if proxy:
            # pre-pass closest-hit state: genuine proxy-triangle hits
            (pt, pid, pu, pv) = rest[:4]
            out_t, out_id, out_u, out_v = rest[4:]
        else:
            out_t, out_id, out_u, out_v = rest
        """tri_ref: (1, 9, SUPER) SMEM block chosen by fetch_ref;
        box_ref: (1, 6, SUPER//CLUSTER) SMEM; rays: (TILE_ROWS, 128) VMEM.

        The hit test itself is intersect_pallas.sweep_block — shared with
        the dense dual-path kernels so epsilon/degenerate policy cannot
        diverge between backends."""
        i = pl.program_id(0)
        k = pl.program_id(1)

        shape = (TILE_ROWS, LANES)

        @pl.when(k == 0)
        def _():
            if proxy:
                out_t[...] = pt[...]
                out_id[...] = pid[...]
                out_u[...] = pu[...]
                out_v[...] = pv[...]
            else:
                out_t[...] = jnp.full(shape, _INF, jnp.float32)
                out_id[...] = jnp.full(shape, -1, jnp.int32)
                out_u[...] = jnp.zeros(shape, jnp.float32)
                out_v[...] = jnp.zeros(shape, jnp.float32)

        # front-to-back early-out: slot k's conservative entry distance is
        # a floor on any new hit it could produce; when every lane already
        # holds a closer hit, skip the 512-triangle sweep entirely
        @pl.when((k < cnt_ref[i]) & jnp.any(out_t[...] > tnear_ref[i, k]))
        def _():
            rays = (ox[...], oy[...], oz[...], dx[...], dy[...], dz[...])
            init = (out_t[...], out_id[...], out_u[...], out_v[...])
            bt, bi, bu, bv = sweep_block(
                lambda ch, j: tri_ref[0, ch, j],
                lambda ch, c: box_ref[0, ch, c],
                rays, fetch_ref[i, k] * SUPER, CLUSTER, SUPER // CLUSTER,
                init,
            )
            out_t[...] = bt
            out_id[...] = bi
            out_u[...] = bu
            out_v[...] = bv

    return kernel


def _call_indexed(tri_s, boxes_s, fetch, counts, tnear_slots, ray_comps,
                  interpret, proxy_init=None):
    """tri_s: (n_blocks, 9, SUPER); boxes_s: (n_blocks, 6, SUPER//64);
    fetch: (n_tiles, kmax); counts: (n_tiles,); rays: (n_rows, 128);
    ``proxy_init``: optional (t, id, u, v) closest-hit state from the
    guaranteed-occluder pre-pass, in the same (n_rows, LANES) layout."""
    n_blocks = tri_s.shape[0]
    n_tiles, kmax = fetch.shape
    n_rows = ray_comps[0].shape[0]
    assert n_rows == n_tiles * TILE_ROWS

    ray_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i, k, *_: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (1, 9, SUPER),
        lambda i, k, fetch_ref, *_: (fetch_ref[i, k], 0, 0),
        memory_space=pltpu.SMEM,
    )
    box_spec = pl.BlockSpec(
        (1, 6, SUPER // CLUSTER),
        lambda i, k, fetch_ref, *_: (fetch_ref[i, k], 0, 0),
        memory_space=pltpu.SMEM,
    )
    extra = list(proxy_init) if proxy_init is not None else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, kmax),
        in_specs=[tri_spec, box_spec] + [ray_spec] * (6 + len(extra)),
        out_specs=[ray_spec] * 4,
    )
    out = pl.pallas_call(
        _kernel_indexed(proxy=proxy_init is not None),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(fetch, counts, tnear_slots, tri_s, boxes_s, *ray_comps, *extra)
    out_t, out_id, out_u, out_v = out
    out_id = jnp.where(out_t < _INF, out_id, -1)
    return out_t, out_id, out_u, out_v


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("interpret", "sort"))
def ray_intersect_bvh(p0, e1, e2, ray_o, ray_d, active=None,
                      interpret: bool = False, sort: bool = True):
    """Closest hit via sorted rays + tile-culled block streaming.

    Triangles should arrive Morton-ordered (the scene layer does this at
    configure); returned ids refer to the given order.  Equivalent results
    to :func:`intersect_pallas.ray_intersect_pallas` — selected by the
    dispatcher for large scenes where per-tile block culling wins.

    ``active``: optional per-ray liveness.  Inactive lanes are PARKED on a
    point outside the scene AABB pointing away from it: the sort clusters
    them into their own tiles, those tiles cull every block, and the
    per-bounce wavefront sheds its dead lanes for (almost) free — the TPU
    answer to CUDA wavefront compaction (a dead lane otherwise still pays
    every visited block's sweep, and worse, mixing dead lanes into a live
    tile inflates its origin box and defeats culling).
    """
    f = p0.shape[0]
    n = ray_o.shape[0]

    if not PARK_DEAD:
        active = None
    if active is not None:
        hi_scene = jnp.max(
            jnp.maximum(jnp.maximum(p0, p0 + e1), p0 + e2), axis=0
        )
        lo_scene = jnp.min(
            jnp.minimum(jnp.minimum(p0, p0 + e1), p0 + e2), axis=0
        )
        park = hi_scene + 0.5 * jnp.maximum(hi_scene - lo_scene, 1.0)
        # +z from above the scene top never re-enters any block
        ray_o = jnp.where(active[:, None], ray_o, park)
        ray_d = jnp.where(
            active[:, None], ray_d,
            jnp.asarray([0.0, 0.0, 1.0], ray_d.dtype),
        )

    f_pad = -(-f // SUPER) * SUPER
    if f_pad != f:
        pad = f_pad - f
        p0 = jnp.concatenate([p0, jnp.zeros((pad, 3), p0.dtype)])
        e1 = jnp.concatenate([e1, jnp.zeros((pad, 3), e1.dtype)])
        e2 = jnp.concatenate([e2, jnp.zeros((pad, 3), e2.dtype)])
    n_blocks = f_pad // SUPER

    tile = TILE_ROWS * LANES
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        pad = n_pad - n
        # pad by REPLICATING the last real ray: a (0,0,0)-origin pad would
        # be folded into sort_rays' global origin extent (collapsing the
        # 10-bit Morton quantization for scenes far from the origin) and
        # would hand its tile a huge origin AABB that defeats block culling
        ray_o = jnp.concatenate([ray_o, jnp.tile(ray_o[-1:], (pad, 1))])
        ray_d = jnp.concatenate([ray_d, jnp.tile(ray_d[-1:], (pad, 1))])

    if sort:
        perm, ray_o, ray_d = sort_rays_carry(ray_o, ray_d)

    # block data layout (same packing as the dense streaming path)
    packed = jnp.concatenate([p0.T, e1.T, e2.T], axis=0)        # (9, f_pad)
    tri_s = jnp.transpose(packed.reshape(9, n_blocks, SUPER), (1, 0, 2))
    nc_total = f_pad // CLUSTER
    v0 = p0.reshape(nc_total, CLUSTER, 3)
    v1 = (p0 + e1).reshape(nc_total, CLUSTER, 3)
    v2 = (p0 + e2).reshape(nc_total, CLUSTER, 3)
    lo = jnp.minimum(jnp.minimum(v0.min(1), v1.min(1)), v2.min(1))
    hi = jnp.maximum(jnp.maximum(v0.max(1), v1.max(1)), v2.max(1))
    boxes = jnp.concatenate([lo.T, hi.T], axis=0)               # (6, nc)
    boxes_s = jnp.transpose(
        boxes.reshape(6, n_blocks, SUPER // CLUSTER), (1, 0, 2)
    )
    # block AABBs = union of their cluster AABBs
    block_lo = lo.reshape(n_blocks, SUPER // CLUSTER, 3).min(axis=1)
    block_hi = hi.reshape(n_blocks, SUPER // CLUSTER, 3).max(axis=1)
    # padding triangles are degenerate at the origin — exclude them from
    # block AABBs is unnecessary (they never hit), but an all-degenerate
    # padding block gets a point AABB and is culled for most tiles anyway.

    proxy_init = None
    t_cull = None
    if PROXY_TRIS > 0:
        # Guaranteed-occluder pre-pass: dense sweep of the largest-area
        # triangles (padding rows are degenerate, area 0, never in top-k).
        # Every hit is a REAL closest-hit candidate: its t is a sound
        # per-ray upper bound, so (a) the indexed kernel starts from this
        # state and (b) blocks entering beyond every lane's bound drop
        # out of the fetch list BEFORE any DMA.
        from .intersect_pallas import ray_intersect_pallas, SMALL_MAX_TRIS
        from .gather import gather_rows_t

        kp = min(PROXY_TRIS, f, SMALL_MAX_TRIS)
        area2 = jnp.sum(jnp.square(jnp.cross(e1[:f], e2[:f])), axis=-1)
        _, top = jax.lax.top_k(area2, kp)
        top = jnp.sort(top)  # keep Morton order for tight cluster boxes
        pid_, pvalid_, puv_, pt_ = ray_intersect_pallas(
            p0[top], e1[top], e2[top], ray_o, ray_d, interpret=interpret
        )
        # map proxy-set ids to global ids WITHOUT a per-lane int gather
        # (small-table gathers serialize through SMEM in-context,
        # CLAUDE.md) — one-hot MXU dot on the f32-exact id table
        mapped = gather_rows_t(
            top.astype(jnp.float32)[:, None], jnp.maximum(pid_, 0)
        )[0]
        pid = jnp.where(pvalid_, mapped.astype(jnp.int32), -1)
        t_ub = jnp.where(pvalid_, pt_, _INF)
        t_cull = t_ub.reshape(-1, tile).max(axis=1)          # (n_tiles,)
        proxy_init = (
            t_ub.reshape(n_pad // LANES, LANES),
            pid.reshape(n_pad // LANES, LANES),
            puv_[:, 0].reshape(n_pad // LANES, LANES),
            puv_[:, 1].reshape(n_pad // LANES, LANES),
        )

    visit, t_near = tile_block_visit(ray_o, ray_d, block_lo, block_hi, tile)
    if t_cull is not None:
        visit = visit & (t_near <= t_cull[:, None])
    fetch, counts, tnear_slots = build_fetch_list(visit, t_near)
    if not EARLY_OUT:
        # zeros never beat out_t (INF-initialized, hits have t > 0): the
        # kernel's skip condition is permanently true => always sweep
        tnear_slots = jnp.zeros_like(tnear_slots)

    ray_comps = [
        ray_o[:, i].reshape(n_pad // LANES, LANES) for i in range(3)
    ] + [ray_d[:, i].reshape(n_pad // LANES, LANES) for i in range(3)]

    out_t, out_id, out_u, out_v = _call_indexed(
        tri_s, boxes_s, fetch, counts, tnear_slots, ray_comps, interpret,
        proxy_init=proxy_init,
    )

    tri_id = out_id.reshape(-1)
    t = out_t.reshape(-1)
    u = out_u.reshape(-1)
    v = out_v.reshape(-1)
    if sort:
        tri_id, t, u, v = unsort_by(perm, (tri_id, t, u, v))
    tri_id, t, u, v = tri_id[:n], t[:n], u[:n], v[:n]
    valid = tri_id >= 0
    uv = jnp.stack([u, v], axis=-1)
    return tri_id, valid, uv, t
