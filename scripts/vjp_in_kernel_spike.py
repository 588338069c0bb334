"""Spike: does jax.vjp inside a Pallas TPU kernel body lower through Mosaic?

Tests the three mechanisms the interior shading megakernel needs:
  1. jax.vjp of a straight-line elementwise function traced INSIDE the
     kernel body (residual sharing between primal and transpose in one DAG),
  2. cotangents of a small broadcast table (cross-lane reduce from the
     broadcast transpose),
  3. grid-sequential accumulation of that table cotangent into one output
     block revisited by every grid step.

Run on CPU (interpret) always; on TPU when available.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, LANES, NL = 8, 128, 4


def f(tab, x, y):
    # representative op mix: selects, safe div, rsqrt, mask logic
    a = tab[0, 0] * x + tab[1, 0]
    b = jnp.where(jnp.abs(y) > 1e-20, a / jnp.where(jnp.abs(y) > 1e-20, y, 1.0), 0.0)
    n2 = a * a + b * b + 1e-3
    inv = jax.lax.rsqrt(n2)
    c = jnp.where(x > 0.5, b * inv, jax.lax.stop_gradient(a) * inv)
    for j in range(NL):
        c = c + tab[2, j] * jnp.square(x - tab[3, j])
    return c * jnp.sqrt(jnp.maximum(n2, 1e-20))


def bwd_kernel(tab_ref, x_ref, y_ref, ct_ref, dtab_ref, dx_ref, dy_ref):
    i = pl.program_id(0)
    tab = tab_ref[...]
    x = x_ref[...]
    y = y_ref[...]
    _, pull = jax.vjp(f, tab, x, y)
    dtab, dx, dy = pull(ct_ref[...])
    dx_ref[...] = dx
    dy_ref[...] = dy

    @pl.when(i == 0)
    def _init():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    dtab_ref[...] += dtab


@functools.partial(jax.jit, static_argnames=("interpret",))
def run_bwd(tab, x, y, ct, interpret=False):
    n_rows = x.shape[0]
    grid = (n_rows // R,)
    tile = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec((4, NL), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        bwd_kernel,
        grid=grid,
        in_specs=[tabspec, tile, tile, tile],
        out_specs=[tabspec, tile, tile],
        out_shape=[
            jax.ShapeDtypeStruct((4, NL), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(tab, x, y, ct)


def main():
    rng = np.random.RandomState(0)
    n_rows = 32
    tab = jnp.asarray(rng.rand(4, NL), jnp.float32)
    x = jnp.asarray(rng.rand(n_rows, LANES), jnp.float32)
    y = jnp.asarray(rng.rand(n_rows, LANES) - 0.5, jnp.float32)
    ct = jnp.asarray(rng.rand(n_rows, LANES), jnp.float32)

    # reference: plain XLA vjp
    _, pull = jax.vjp(f, tab, x, y)
    rtab, rx, ry = pull(ct)

    for interp in ([True] if jax.default_backend() != "tpu" else [True, False]):
        dtab, dx, dy = run_bwd(tab, x, y, ct, interpret=interp)
        for name, a, b in (("dtab", rtab, dtab), ("dx", rx, dx), ("dy", ry, dy)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        print(f"interpret={interp}: OK (backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
