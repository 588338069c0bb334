"""Microbench: gather formulations for the splat transpose.

The fused-step edge pullbacks gather the (n_pix, 3) loss-cotangent image at
8.4M per-lane pixel ids (the transpose of splat_add's scatter).  The XLA
dynamic-gather fusion measures ~110 ms per pass on v5e (profile
2026-08-17); each (1,3) row access reads a whole (8,128) tile -> ~34 GB of
HBM traffic.  This ranks alternative formulations in-jit (10 reps per
timing to amortize the ~28 ms axon call floor).
"""

import sys
import time

import jax
import jax.numpy as jnp

N_PIX = 512 * 512
N = N_PIX * 32  # 8.4M lanes
REPS = 10


def timed(name, fn, *args):
    out = fn(*args)
    float(out.sum())
    t0 = time.perf_counter()
    out = fn(*args)
    float(out.sum())
    dt = (time.perf_counter() - t0) / REPS
    print(f"{1e3 * dt:9.2f} ms/rep  {name}", flush=True)


def rep(body):
    """Run body(idx) REPS times with varying idx, reduce to a scalar."""

    def run(ct, idx):
        def it(acc, i):
            v = body(ct, (idx + i) % N_PIX)
            return acc + v.sum(), 0

        acc, _ = jax.lax.scan(it, jnp.float32(0.0),
                              jnp.arange(REPS, dtype=jnp.int32))
        return acc

    return jax.jit(run)


def main():
    key = jax.random.PRNGKey(0)
    ct = jax.random.normal(key, (N_PIX, 3), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N_PIX,
                             dtype=jnp.int32)
    idx = jax.device_put(idx)

    # v0: row gather (current XLA transpose of the scatter-add)
    timed("v0 rows ct[idx]", rep(lambda c, i: c[i]), ct, idx)

    # v1: three contiguous per-channel 1-D gathers
    def v1(c, i):
        c0, c1, c2 = [jnp.asarray(c[:, k]) for k in range(3)]
        return c0[i] + c1[i] + c2[i]

    timed("v1 3x 1-D channel gathers", rep(v1), ct, idx)

    # v2: gather along the lane axis of the transposed table
    def v2(c, i):
        return jnp.take(c.T, i, axis=1).sum(axis=0)

    timed("v2 lane-axis take of ct.T", rep(v2), ct, idx)

    # v3: flat interleaved 1-D gather
    def v3(c, i):
        cf = c.reshape(-1)
        return cf[i * 3] + cf[i * 3 + 1] + cf[i * 3 + 2]

    timed("v3 flat interleaved 1-D", rep(v3), ct, idx)

    # v4: row gather from a (n_pix, 128)-padded table (dense-lane layout)
    def v4(c, i):
        cp = jnp.pad(c, ((0, 0), (0, 125)))
        return cp[i][:, :3]

    timed("v4 rows from 128-padded", rep(v4), ct, idx)

    # v5: one 1-D gather of packed rows: pack 3 f32 channels as 3 separate
    # gathers from ONE flat (3*n_pix,) planar table
    def v5(c, i):
        cf = c.T.reshape(-1)  # planar: [c0..., c1..., c2...]
        return cf[i] + cf[i + N_PIX] + cf[i + 2 * N_PIX]

    timed("v5 planar flat 1-D x3", rep(v5), ct, idx)


if __name__ == "__main__":
    main()
