"""Image accumulation helpers.

The reference splats with CUDA ``scatter_reduce(Add)`` atomics
(``integrator.cpp:127-129``) — non-deterministic float order.  On TPU we use
XLA scatter-add (deterministic) for edge samples, and plain reshape+mean for
the interior term whose sample->pixel map is affine.
"""

from __future__ import annotations

import jax.numpy as jnp


def splat_add(values, idx, n_pix: int):
    """Scatter-add (N, C) values at (N,) pixel ids into (n_pix, C).

    Negative ids are dropped (mode='drop' handles out-of-range).
    """
    idx = jnp.where(idx >= 0, idx, n_pix)  # out of range -> dropped
    img = jnp.zeros((n_pix, values.shape[-1]), values.dtype)
    return img.at[idx].add(values, mode="drop")


def interior_average(values, n_active_pix: int, spp: int):
    """(n_pix*spp, C) pixel-major samples -> (n_pix, C) mean."""
    return values.reshape(n_active_pix, spp, values.shape[-1]).mean(axis=1)
