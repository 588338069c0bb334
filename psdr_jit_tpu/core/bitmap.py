"""Differentiable bitmap textures (reference: src/core/bitmap.cpp).

A :class:`Bitmap` stores data as a ``(H, W, C)`` float32 array plus a
differentiable UV transform (scale / rotation / translation) and evaluates
with bilinear filtering and wrap-around, including the special lat-long
environment-map wrap mode (``bitmap.cpp:87-110``).

Constant "textures" are ``(1, 1, C)`` arrays — the eval shortcut matches the
reference (``bitmap.cpp:54-59``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from .types import mutable_pytree


def _eval_bitmap(data, scale, rot, trans, uv, flip_v: bool, envmap_mode: bool):
    """Bilinear texture lookup with differentiable UV transform.

    ``data``: (H, W, C); ``uv``: (..., 2).  Returns (..., C).
    Follows bitmap.cpp:61-131 step for step.
    """
    h, w = data.shape[0], data.shape[1]
    if h == 1 and w == 1:
        return jnp.broadcast_to(data[0, 0], uv.shape[:-1] + (data.shape[-1],))

    c, s = jnp.cos(rot), jnp.sin(rot)
    x = (uv[..., 0] - 0.5) * c + (uv[..., 1] - 0.5) * s + 0.5
    y = -(uv[..., 0] - 0.5) * s + (uv[..., 1] - 0.5) * c + 0.5
    if flip_v:
        y = -y
    x = x * scale
    y = y * scale
    x = x - (-0.5 + scale / 2.0)
    y = y + (-0.5 + scale / 2.0)
    x = x + trans[0]
    y = y + trans[1]

    if envmap_mode:
        x = x - 0.5 / w
        x = x - jnp.floor(x)
        y = y - jnp.floor(y)
        x = x * w
        y = y * (h - 1)
        px = jnp.floor(x).astype(jnp.int32)
        py = jnp.floor(y).astype(jnp.int32)
        w1x, w1y = x - px, y - py
        py = jnp.minimum(py, h - 2)
        xp1 = jnp.mod(px + 1, w)
    else:
        x = x - jnp.floor(x)
        y = y - jnp.floor(y)
        x = x * (w - 1)
        y = y * (h - 1)
        px = jnp.floor(x).astype(jnp.int32)
        py = jnp.floor(y).astype(jnp.int32)
        w1x, w1y = x - px, y - py
        px = jnp.minimum(px, w - 2)
        py = jnp.minimum(py, h - 2)
        xp1 = px + 1

    px = jnp.clip(px, 0, w - 1)
    xp1 = jnp.clip(xp1, 0, w - 1)
    py = jnp.clip(py, 0, h - 1)

    # ONE packed (H, W, 4C) gather instead of four (H, W, C) gathers: every
    # gathered row costs a full (8,128) tile of HBM traffic regardless of
    # width, so the 4 taps of a (N,) lane batch measured 176 ms/step on the
    # envmap workload as separate fetches (scripts/attribute_profile.py,
    # bitmap.py:71-74, 2026-08-19).  The +1 neighbours are PRE-SHIFTED into
    # the packed table with rolls (differentiable; the wrap rows/cols are
    # never addressed: xp1 is mod w in envmap mode and <= w-1 after the
    # clips otherwise, py+1 <= h-1 by the min above — and for h == 1 the
    # wrap row equals the clamp row the old out-of-range gather clipped
    # to).  Backward improves the same way: one scatter-add transpose
    # instead of four.
    rx = jnp.roll(data, -1, axis=1)
    packed = jnp.concatenate([
        data, rx,
        jnp.roll(data, -1, axis=0), jnp.roll(rx, -1, axis=0),
    ], axis=-1)
    taps = packed[py, px]
    nc = data.shape[-1]
    v00 = taps[..., 0:nc]
    v10 = taps[..., nc:2 * nc]
    v01 = taps[..., 2 * nc:3 * nc]
    v11 = taps[..., 3 * nc:4 * nc]
    w0x, w0y = 1.0 - w1x, 1.0 - w1y
    v0 = w0x[..., None] * v00 + w1x[..., None] * v10
    v1 = w0x[..., None] * v01 + w1x[..., None] * v11
    return w0y[..., None] * v0 + w1y[..., None] * v1


@mutable_pytree(leaves=("data", "scale", "rot", "trans"))
class Bitmap:
    """Mutable texture object: ``data`` (H, W, C) plus UV transform leaves."""

    def __init__(self, data, scale=1.0, rot=0.0, trans=(0.0, 0.0)):
        self.data = jnp.asarray(data, jnp.float32)
        self.scale = jnp.float32(scale)
        self.rot = jnp.float32(rot)
        self.trans = jnp.asarray(trans, jnp.float32)

    @staticmethod
    def from_value(value, channels: int) -> "Bitmap":
        arr = np.asarray(value, np.float32).reshape(-1)
        if arr.size == 1 and channels == 3:
            arr = np.repeat(arr, 3)
        assert arr.size == channels, f"expected {channels} channels, got {arr.size}"
        return Bitmap(arr.reshape(1, 1, channels))

    @staticmethod
    def from_array(array) -> "Bitmap":
        arr = jnp.asarray(array, jnp.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        assert arr.ndim == 3
        return Bitmap(arr)

    def fill(self, value):
        arr = np.asarray(value, np.float32).reshape(-1)
        self.data = jnp.asarray(arr, jnp.float32).reshape(1, 1, arr.size)

    # reference attribute aliases (psdr.cpp:204-206 'translate'/'rotate')
    @property
    def translate(self):
        return self.trans

    @translate.setter
    def translate(self, v):
        self.trans = jnp.asarray(v, jnp.float32)

    @property
    def rotate(self):
        return self.rot

    @rotate.setter
    def rotate(self, v):
        self.rot = jnp.float32(v)

    def load_openexr(self, path: str):
        """Load pixel data from an EXR file (reference Bitmap::load_openexr)."""
        from ..utils.image import read_image

        arr = np.asarray(read_image(path), np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if self.channels == 1 and arr.shape[-1] > 1:
            arr = arr[..., :1]
        elif self.channels == 3 and arr.shape[-1] == 4:
            arr = arr[..., :3]
        elif self.channels == 3 and arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        self.data = jnp.asarray(arr)
        return self

    @property
    def resolution(self):
        return (self.data.shape[1], self.data.shape[0])  # (W, H)

    @property
    def channels(self) -> int:
        return self.data.shape[-1]

    def eval(self, uv, flip_v: bool = True, envmap_mode: bool = False):
        """Evaluate at (..., 2) uv; returns (..., C)."""
        return _eval_bitmap(
            self.data, self.scale, self.rot, self.trans, uv, flip_v, envmap_mode
        )

    def eval1(self, uv, flip_v: bool = True):
        """Single-channel convenience: returns (...,)."""
        return self.eval(uv, flip_v)[..., 0]


def Bitmap1f(value=0.0) -> Bitmap:
    """Reference-compatible constructor for 1-channel bitmaps.

    Accepts a scalar, an (H, W[, 1]) array, or an image file path
    (reference Bitmap1fD(const char*), psdr.cpp:199).
    """
    if isinstance(value, str):
        return Bitmap.from_value(np.float32(0.0), 1).load_openexr(value)
    arr = np.asarray(value, np.float32)
    if arr.ndim >= 2:
        return Bitmap.from_array(arr if arr.ndim == 3 else arr[..., None])
    return Bitmap.from_value(arr, 1)


def Bitmap3f(value=(0.5, 0.5, 0.5)) -> Bitmap:
    """Reference-compatible constructor for 3-channel bitmaps.

    Accepts an RGB triple, an (H, W, 3) array, or an image file path.
    """
    if isinstance(value, str):
        return Bitmap.from_value(np.full(3, 0.5, np.float32), 3).load_openexr(value)
    arr = np.asarray(value, np.float32)
    if arr.ndim >= 3:
        return Bitmap.from_array(arr)
    return Bitmap.from_value(arr, 3)
