"""Differentiation-friendly row gathers.

TPU scatter-add has a large fixed cost (~30 ms per op on v5e, independent of
update count), and reverse-mode AD transposes every gather of differentiable
data into one.  For the small tables this renderer gathers per hit/sample
(triangle SoA, edge SoA, screen-edge endpoints), a one-hot matmul is the
fast path: its transpose is a single MXU matmul into the table.

``gather_rows(matrix, idx)`` — (F, D) table, integer idx of any shape →
(idx.shape + (D,)) rows.  Uses the one-hot path when F <= threshold,
falling back to a plain gather (whose backward is one scatter for the whole
packed table — still far better than one scatter per field).

Precision: HIGHEST throughout.  An asymmetric (DEFAULT, HIGHEST) config —
the one-hot operand is exact in bf16, so fewer MXU passes suffice — was
A/B'd on v5e (2026-08-18) at zero measured gain on the full fused step
(697.6 vs 698.6 ms/step) with slightly worse transpose rounding, so the
simple symmetric form stays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ONE_HOT_MAX_ROWS = 1024


def gather_rows(matrix, idx, one_hot_max_rows: int = ONE_HOT_MAX_ROWS):
    f = matrix.shape[0]
    if f <= one_hot_max_rows:
        oh = jax.nn.one_hot(idx, f, dtype=matrix.dtype)
        return jax.lax.dot_general(
            oh, matrix, (((oh.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    return matrix[idx]
