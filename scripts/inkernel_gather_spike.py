"""Mosaic feasibility spike: in-kernel one-hot MXU gather (r5).

Can a Pallas TPU kernel fetch per-lane table rows via per-sublane-row
one-hot dots, exactly (bf16x3 split staged in VMEM), and scatter the
adjoint back with a lane-contracting dot?  If this lowers and runs fast,
the shade megakernel can absorb gather_rows_t entirely (eliminating the
one-hot compares, the (30, n) materializations, the relayout copies and
the bf16 cotangent splits — ~40 ms/step of XLA machinery on the headline).

Checks:
  1. forward: rows[j] == table[idx[j]] bitwise for f32 tables,
  2. adjoint: d_table == one-hot^T @ ct exactly,
  3. timing vs the XLA gather_rows_t on the same shapes.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psdr_jit_tpu.ops.gather import _trunc_parts, gather_rows_t

LANES = 128
R = 16          # sublane rows per tile
D = 30          # table columns
F = 40          # table rows (cbox class)


def _kernel(n_rows):
    def kernel(t3_ref, idx_ref, out_ref):
        # t3_ref: (3F, D) bf16 split table (VMEM, whole); idx_ref: (R, 128)
        # f32 ids; out: (D, R, 128) rows
        t3 = t3_ref[...]                       # (3F, D) f32 (bf16 values)
        idx = idx_ref[...]                     # (R, 128) f32
        f3 = t3.shape[0]
        f = f3 // 3
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (f3, LANES), 0)
        idm = (iota_i % f).astype(jnp.float32)  # row k of block b -> k
        for r in range(R):
            row_ids = idx[r:r + 1, :]          # (1, 128)
            # tripled one-hot: row b*F+j is (idx == j); bf16-exact 0/1
            oh = jnp.equal(idm, row_ids).astype(jnp.float32)
            # DEFAULT precision = ONE bf16 MXU pass; both operands are
            # exactly bf16-representable, so the product is exact
            rows = jax.lax.dot_general(
                t3, oh, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )                                   # (D, 128)
            out_ref[:, r, :] = rows

    return kernel


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((F, D)), jnp.float32)
    n = 1 << 17
    idx = jnp.asarray(rng.integers(0, F, n), jnp.int32)
    n_rows = n // LANES

    hi, mid, lo = _trunc_parts(table)
    t3 = jnp.concatenate([hi, mid, lo], axis=0).astype(jnp.float32)
    idx_f = idx.astype(jnp.float32).reshape(n_rows, LANES)

    tile = pl.BlockSpec((R, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    t3_spec = pl.BlockSpec((3 * F, D), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((D, R, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    fn = pl.pallas_call(
        _kernel(n_rows),
        grid=(n_rows // R,),
        in_specs=[t3_spec, tile],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((D, n_rows, LANES), jnp.float32),
    )
    jit_fn = jax.jit(lambda t, i: fn(t, i))
    t0 = time.perf_counter()
    try:
        out = np.asarray(jit_fn(t3, idx_f))
    except Exception as e:
        print("LOWERING FAILED:", str(e)[-4000:])
        return
    print(f"compiled+ran in {time.perf_counter()-t0:.1f} s", flush=True)
    ref = np.asarray(table)[np.asarray(idx)]           # (n, D)
    got = out.reshape(D, n).T
    exact = (got == ref).all()
    print("forward bitwise exact:", exact,
          "max abs diff:", np.abs(got - ref).max(), flush=True)

    # timing: kernel vs XLA gather_rows_t, interleaved
    x_fn = jax.jit(lambda t, i: gather_rows_t(t, i))
    _ = np.asarray(x_fn(table, idx))

    def force(x):
        return float(x.sum())

    for _ in range(2):
        force(jit_fn(t3, idx_f))
        force(x_fn(table, idx))
    for name, f, args in (("kernel", jit_fn, (t3, idx_f)),
                          ("xla", x_fn, (table, idx))):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                force(f(*args))
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"{name}: {1e3*best:.2f} ms for {n} rows", flush=True)


if __name__ == "__main__":
    main()
