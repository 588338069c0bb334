"""Which formulation of the transposed exact-bf16x3 gather is exact on TPU?

gather_rows_t's _sel3_t dot — (3F, D) x (3F, N) contracting dim 0, D=30 —
comes back with bf16-level error on the real backend while the
row-layout _sel3 dot is bitwise.  Try the candidate fixes.
"""
import sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
from psdr_jit_tpu.ops.gather import _split3, gather_rows, gather_rows_t

F, D, N = 192, 30, 7000
rng = np.random.default_rng(1)
tab = jnp.asarray(rng.normal(size=(F, D)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, F, size=N), jnp.int32)
want = np.asarray(tab)[np.asarray(idx)]      # (N, D)


def report(name, got_dn):
    g = np.asarray(got_dn)
    print(f"{name}: bitwise {np.array_equal(g, want.T)}  "
          f"max abs {np.abs(g - want.T).max():.3e}", flush=True)


# current implementation
report("gather_rows_t (current)", jax.jit(gather_rows_t)(tab, idx))

# row path for comparison
g = np.asarray(jax.jit(gather_rows)(tab, idx))
print(f"gather_rows (row layout): bitwise {np.array_equal(g, want)}  "
      f"max abs {np.abs(g - want).max():.3e}", flush=True)


def t3_of(m):
    f, d = m.shape
    return _split3(m).reshape(f, 3, d).swapaxes(0, 1).reshape(3 * f, d)


def oh3t_of(i):
    j = jax.lax.iota(jnp.int32, 3 * F) % F
    return (j[:, None] == i[None, :]).astype(jnp.bfloat16)


@jax.jit
def v_contract1(tab, idx):
    # pre-transpose t3 so the contraction is dim 1 x dim 0 (plain matmul)
    t3t = t3_of(tab).T                        # (D, 3F)
    return jax.lax.dot_general(
        t3t, oh3t_of(idx), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


report("pre-transposed (D,3F)x(3F,N)", v_contract1(tab, idx))


@jax.jit
def v_highest(tab, idx):
    t3 = t3_of(tab)
    return jax.lax.dot_general(
        t3, oh3t_of(idx), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


report("current + HIGHEST", v_highest(tab, idx))


@jax.jit
def v_three_dots(tab, idx):
    # three separate (F,D)x(F,N) dots summed in f32 outside the MXU
    parts = _split3(tab)                      # (F, 3D)
    hi, mid, lo = (parts[:, :D], parts[:, D:2 * D], parts[:, 2 * D:])
    j = jax.lax.iota(jnp.int32, F)
    oh = (j[:, None] == idx[None, :]).astype(jnp.bfloat16)  # (F, N)
    def dd(p):
        return jax.lax.dot_general(
            p, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return dd(hi) + dd(mid) + dd(lo)


report("three dots + f32 adds", v_three_dots(tab, idx))


@jax.jit
def v_rows_T(tab, idx):
    # row-layout exact gather, transposed afterwards
    return gather_rows(tab, idx).T


report("gather_rows(...).T", v_rows_T(tab, idx))
