"""Sampling distributions.

* :class:`DiscreteDistribution` — PMF/CDF sampling with sample reuse
  (reference ``src/core/pmf.cpp``), built with ``jnp.cumsum`` on device
  instead of the reference's CPU scan (``pmf.h:12-38``).
* :class:`HyperCubeDistribution` — regular-grid PMF over the unit square/cube
  (reference ``src/core/cube_distrb.cpp``), used for envmap importance
  sampling (2D) and secondary-edge guiding (3D).

Both are pytrees so they live inside jitted scene data.  Sampling tables are
always detached — the reference computes CDFs from detached quantities too.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .types import pytree, static_field
from .math import searchsorted_1d, safe_div, SEARCHSORTED_DENSE_MAX


def _sample_dense(cdf, pmf, scaled):
    """(idx, pmf[idx], cdf[idx-1]) for one shared small table, with ZERO
    gathers: device profiling (2026-08-17, v5e) showed both per-row
    ``take_along_axis`` AND tiny shared-table gathers (``pmf[idx]`` with an
    80-entry table) lowering to SMEM-serialized scalar loops at ~200x below
    VPU throughput inside the edge-pass scans.  Dense (lanes, N) compares +
    row reductions fuse into streaming VPU code instead.
    """
    shape = scaled.shape
    flat = scaled.reshape(-1)
    lt = cdf[None, :] < flat[:, None]                      # (L, N)
    idx = jnp.minimum(
        jnp.sum(lt, axis=-1, dtype=jnp.int32), cdf.shape[0] - 1
    )
    lower = jnp.max(jnp.where(lt, cdf[None, :], 0.0), axis=-1)  # cdf[idx-1]
    ge = ~lt
    first = ge & jnp.concatenate(
        [jnp.ones((flat.shape[0], 1), bool), lt[:, :-1]], axis=-1
    )
    # if scaled > total (u == 1.0 edge) no 'first' is set: fall back to last
    none_set = ~jnp.any(first, axis=-1)
    p = jnp.sum(jnp.where(first, pmf[None, :], 0.0), axis=-1)
    p = jnp.where(none_set, pmf[-1], p)
    lower_last = cdf[-2] if cdf.shape[0] > 1 else jnp.float32(0.0)
    lower = jnp.where(none_set, lower_last, lower)
    return idx.reshape(shape), p.reshape(shape), lower.reshape(shape)


@pytree
class DiscreteDistribution:
    pmf: Any  # (N,) unnormalized masses
    cdf: Any  # (N,) inclusive cumulative sum

    @staticmethod
    def init(pmf) -> "DiscreteDistribution":
        pmf = jax.lax.stop_gradient(jnp.asarray(pmf, jnp.float32))
        return DiscreteDistribution(pmf=pmf, cdf=jnp.cumsum(pmf))

    @property
    def size(self) -> int:
        return self.pmf.shape[0]

    @property
    def total(self):
        return self.cdf[-1]

    # reference-compatible accessors (psdr.cpp:187-192)
    @property
    def sum(self):
        return self.total

    def pmf_normalized(self):
        """Normalized probability masses (reference ``pmf()``)."""
        return self.pmf / self.total

    def sample(self, u):
        """Return (idx, normalized pdf) for uniform samples ``u``."""
        scaled = u * self.total
        if self.size <= SEARCHSORTED_DENSE_MAX:
            idx, p, _ = _sample_dense(self.cdf, self.pmf, scaled)
        else:
            idx = searchsorted_1d(self.cdf, scaled)
            p = self.pmf[idx]
        return idx, p / self.total

    def sample_reuse(self, u):
        """Return (idx, pdf, u') reusing the random number (pmf.cpp:30-51)."""
        if self.size == 1:
            idx = jnp.zeros(u.shape, jnp.int32)
            return idx, jnp.ones_like(u), u
        scaled = u * self.total
        if self.size <= SEARCHSORTED_DENSE_MAX:
            idx, p, lower = _sample_dense(self.cdf, self.pmf, scaled)
        else:
            idx = searchsorted_1d(self.cdf, scaled)
            lower = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
            p = self.pmf[idx]
        u_new = jnp.clip(safe_div(scaled - lower, p), 0.0, 1.0)
        return idx, p / self.total, u_new


@pytree
class HyperCubeDistribution:
    """Regular-grid PMF over [0,1]^d (cube_distrb.cpp:10-64).

    ``sample_reuse(u)`` warps d-dimensional uniform samples toward
    high-mass cells and returns the pdf of the warped sample; ``pdf(p)``
    evaluates the density at a point.
    """

    res: Any = static_field()        # tuple of ints, length d
    distrb: DiscreteDistribution = None

    @staticmethod
    def init(res, mass) -> "HyperCubeDistribution":
        res = tuple(int(r) for r in res)
        n = 1
        for r in res:
            n *= r
        mass = jnp.asarray(mass, jnp.float32).reshape(n)
        return HyperCubeDistribution(res=res, distrb=DiscreteDistribution.init(mass))

    @property
    def num_cells(self) -> int:
        n = 1
        for r in self.res:
            n *= r
        return n

    def cell_coords(self, idx):
        """Unflatten cell index -> integer coords, row-major over res."""
        coords = []
        for r in reversed(self.res):
            coords.append(idx % r)
            idx = idx // r
        return jnp.stack(list(reversed(coords)), axis=-1)

    def sample_reuse(self, samples):
        """Warp (..., d) uniforms; returns (warped_samples, pdf).

        The cell is chosen with the *last* coordinate (reused), then the
        point is jittered uniformly inside the cell (cube_distrb.cpp:43-49).
        """
        d = len(self.res)
        u_last, _ = samples[..., d - 1], None
        idx, p_cell, u_last = self.distrb.sample_reuse(u_last)
        coords = self.cell_coords(idx).astype(jnp.float32)
        res = jnp.asarray(self.res, jnp.float32)
        unit = 1.0 / res
        inner = jnp.concatenate(
            [samples[..., : d - 1], u_last[..., None]], axis=-1
        )
        warped = (coords + inner) * unit
        pdf = p_cell * float(self.num_cells)
        return warped, pdf

    def pdf(self, p):
        """Density at points p in [0,1]^d (cube_distrb.cpp:53-64)."""
        res = jnp.asarray(self.res, jnp.float32)
        ip = jnp.floor(p * res).astype(jnp.int32)
        valid = jnp.all(
            (ip >= 0) & (ip < jnp.asarray(self.res, jnp.int32)), axis=-1
        )
        ip = jnp.clip(ip, 0, jnp.asarray(self.res, jnp.int32) - 1)
        flat = ip[..., 0]
        for i in range(1, len(self.res)):
            flat = flat * self.res[i] + ip[..., i]
        total = self.distrb.total
        dens = safe_div(self.distrb.pmf[flat], total) * float(self.num_cells)
        return jnp.where(valid, dens, 0.0)
