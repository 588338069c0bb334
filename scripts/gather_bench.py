"""Microbenchmark TPU per-lane table-lookup strategies.

Answers, with device numbers: at which table size do plain gathers
(``table[idx]``), one-hot matmuls (``ops/gather.gather_rows``), dense
compare-reductions, and 2D texture-style gathers (``data[py, px]``) win?
Informs SEARCHSORTED_DENSE_MAX / ONE_HOT_MAX_ROWS and whether bitmap
bilinear lookups need a different formulation.

Amortizes the ~28 ms axon round-trip by looping inside jit (lax.scan of 32
dependent iterations).  Run alone on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

LANES = 1 << 17  # one chunk's worth
ITERS = 32


def timeit(fn, *args):
    out = jax.jit(fn)(*args)
    s = float(jnp.sum(out))
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3  # ms per iteration


def loop(body):
    def fn(*args):
        def step(c, _):
            return c + body(*args, salt=c), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=ITERS)
        return out
    return fn


def main():
    rng = np.random.default_rng(0)
    idx_base = jnp.asarray(rng.integers(0, 1 << 30, LANES), jnp.int32)

    for n in (64, 256, 1024, 4096, 65536, 1 << 20):
        table = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
        idx = idx_base % n

        def plain(table, idx, salt):
            rows = table[(idx + salt.astype(jnp.int32)) % n]
            return jnp.sum(rows) * 1e-9

        def onehot(table, idx, salt):
            i = (idx + salt.astype(jnp.int32)) % n
            oh = jax.nn.one_hot(i, n, dtype=jnp.float32)
            rows = jax.lax.dot_general(
                oh, table, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(rows) * 1e-9

        t_plain = timeit(loop(plain), table, idx)
        line = f"n={n:>8}: plain {t_plain:8.3f} ms"
        if n <= 8192:
            t_oh = timeit(loop(onehot), table, idx)
            line += f"   one-hot {t_oh:8.3f} ms"
        print(line, flush=True)

    # 2D texture-style bilinear gather (H, W, 3)
    for hw in (64, 512, 2048):
        data = jnp.asarray(rng.normal(size=(hw, hw, 3)), jnp.float32)
        px = idx_base % hw
        py = (idx_base // hw) % hw

        def tex(data, px, py, salt):
            x = (px + salt.astype(jnp.int32)) % (hw - 1)
            y = py % (hw - 1)
            v00 = data[y, x]
            v10 = data[y, x + 1]
            v01 = data[y + 1, x]
            v11 = data[y + 1, x + 1]
            return jnp.sum(v00 + v10 + v01 + v11) * 1e-9

        print(f"tex {hw}x{hw}: {timeit(loop(tex), data, px, py):8.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
