"""Path-replay backpropagation: a ``jax.custom_vjp`` reverse pass for the
interior term (SURVEY §7 step 5; reference AD contract README.md:102-104).

The default reverse path rematerializes whole lane chunks
(``jax.checkpoint`` in base.py), which re-runs every intersection kernel in
the backward sweep.  Path replay instead:

* forward: runs the normal interior estimator while RECORDING the detached
  intersection payloads ``(tri_id, valid, uv)`` on an :class:`IntersectTape`
  — payloads are the custom_vjp residuals (13 B/lane/intersection);
* backward: REPLAYS the tape — differentiable hit states are reconstructed
  from payloads + scene tables (the path-space formulation makes the hit
  point a function of vertices and detached barycentrics only), so no ray
  is ever re-traced — and chains per-bounce ``jax.vjp`` pullbacks in
  reverse over the full float state (intersection + throughput), which
  keeps the cross-bounce position/frame gradient chains EXACT (unlike
  classic PRB, which detaches them).

Reverse-mode only: select with ``PSDR_REMAT=prb``.  Forward-mode grad
images (``jax.jvp``) use the default remat path — ``custom_vjp`` functions
do not support ``jvp``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.sampler import Sampler
from ..core.types import Intersection
from ..core.math import scrub_nonfinite
from ..ops.image import interior_average


class IntersectTape:
    """Records detached intersection payloads (record mode) or feeds them
    back to ``SceneData.ray_intersect`` (replay mode), in call order."""

    __slots__ = ("items", "cursor", "replaying")

    def __init__(self, items=None):
        self.items = list(items) if items is not None else []
        self.cursor = 0
        self.replaying = items is not None

    def append(self, payload):
        self.items.append(payload)

    def pop(self):
        p = self.items[self.cursor]
        self.cursor += 1
        return p


_FLOAT_FIELDS = ("t", "p", "n", "sh_frame", "wi", "uv", "J",
                 "dp_du", "dp_dv", "bc")
_AUX_FIELDS = ("valid", "tri_id", "mesh_id", "face_indices")


def _split_its(its):
    return ({k: getattr(its, k) for k in _FLOAT_FIELDS},
            {k: getattr(its, k) for k in _AUX_FIELDS})


def _join_its(fst, aux):
    return Intersection(**fst, **aux)


def _float0_zeros(x):
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


def _add_cotangents(a, b):
    if a is None:
        return b

    def add(x, y):
        if hasattr(x, "dtype") and x.dtype == jax.dtypes.float0:
            return x
        return x + y

    return jax.tree_util.tree_map(add, a, b)


def make_prb_chunk(integrator, opts, sensor_id: int, spp: int):
    """Build the custom_vjp per-chunk interior renderer for ``integrator``
    (a PathTracer-shaped integrator: Le at camera hit + max_depth bounces of
    ``nee_contribution`` / ``bsdf_bounce``)."""
    from .base import interior_lane_setup
    from .path import nee_contribution, bsdf_bounce

    width, height = opts.width, opts.height
    max_depth = integrator.max_depth
    hide_emitters = integrator.hide_emitters

    def lane_setup(seed, pix_chunk):
        # shared with base.interior_chunk — the backward replays this exact
        # sampler schedule, so there must be only one definition
        return interior_lane_setup(width, height, spp, seed, pix_chunk)

    def forward(sd, seed, pix_chunk, tape):
        m, sampler, samples = lane_setup(seed, pix_chunk)
        sensor = sd.sensors[sensor_id]
        ray = sensor.sample_primary_ray(samples, diff=True)
        active = jnp.ones((m * spp,), bool)
        value = integrator.Li(sd, sampler, ray, active, True, tape=tape)
        value = scrub_nonfinite(value)
        return interior_average(value, m, spp)

    @jax.custom_vjp
    def chunk(sd, seed, pix_chunk):
        return forward(sd, seed, pix_chunk, None)

    def chunk_fwd(sd, seed, pix_chunk):
        tape = IntersectTape()
        out = forward(sd, seed, pix_chunk, tape)
        return out, (sd, seed, pix_chunk, tuple(tape.items))

    def chunk_bwd(res, g):
        sd, seed, pix_chunk, payloads = res
        tape = IntersectTape(payloads)  # replay — zero re-intersections
        m, sampler, samples = lane_setup(seed, pix_chunk)
        n_lanes = m * spp
        active0 = jnp.ones((n_lanes,), bool)

        # ---- forward sweep: build per-bounce pullbacks ------------------
        def f0(sd_):
            sensor = sd_.sensors[sensor_id]
            ray = sensor.sample_primary_ray(samples, diff=True)
            its0 = sd_.ray_intersect(ray, active0, mode="solid", diff=True,
                                     tape=tape)
            act = active0 & its0.valid
            if hide_emitters:
                le0 = jnp.zeros((n_lanes, 3), jnp.float32)
            else:
                le0 = sd_.Le(its0, act)
            fst, aux = _split_its(its0)
            thr = jnp.ones((n_lanes, 3), jnp.float32)
            return (le0, fst, thr), (aux, act)

        (le0, fst, thr), pull0, (aux, act) = jax.vjp(f0, sd, has_aux=True)
        value_total = le0
        pulls = []
        for _d in range(max_depth):
            aux_prev, act_prev = aux, act

            def fd(sd_, fst_, thr_, _aux=aux_prev, _act=act_prev):
                its = _join_its(fst_, _aux)
                r = nee_contribution(sd_, its, sampler, _act, True, thr_,
                                     tape=tape)
                its1, act1, bsdf_val, weight2, _eta = bsdf_bounce(
                    sd_, its, sampler, _act, True, tape=tape
                )
                thr1 = thr_ * bsdf_val
                contrib = sd_.Le(its1, act1) * thr1 * weight2[..., None]
                r = r + jnp.where(act1[..., None], contrib, 0.0)
                fst1, aux1 = _split_its(its1)
                return (r, fst1, thr1), (aux1, act1)

            (r_d, fst, thr), pull_d, (aux, act) = jax.vjp(
                fd, sd, fst, thr, has_aux=True
            )
            value_total = value_total + r_d
            pulls.append(pull_d)

        # ---- adjoint sweep ----------------------------------------------
        # interior_average transpose: lanes are pixel-major, mean over spp
        g_lane = jnp.repeat(g, spp, axis=0) / float(spp)
        # scrub_nonfinite transpose: zero where the primal was scrubbed
        g_lane = jnp.where(jnp.isfinite(value_total), g_lane, 0.0)

        fst_bar = jax.tree_util.tree_map(jnp.zeros_like, fst)
        thr_bar = jnp.zeros_like(thr)
        sd_bar = None
        for pull_d in reversed(pulls):
            sdb, fst_bar, thr_bar = pull_d((g_lane, fst_bar, thr_bar))
            sd_bar = _add_cotangents(sd_bar, sdb)
        (sdb0,) = pull0((g_lane, fst_bar, thr_bar))
        sd_bar = _add_cotangents(sd_bar, sdb0)
        return (sd_bar, _float0_zeros(seed), _float0_zeros(pix_chunk))

    chunk.defvjp(chunk_fwd, chunk_bwd)
    return chunk
