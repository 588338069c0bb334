"""Measure TPU scatter-add scaling at the envmap-gradient shapes.

The round-4 envmap profile (/tmp/envprof_r4b.log, 2026-08-20) attributes
~84 ms/step to 18 scatter-adds into the packed envmap-gradient table
(12, 524288) — 3 call sites x 6 interior chunks, 98304 updates each,
from the transpose of the packed bilinear fetch (core/bitmap.py:89).

Question this answers before any restructuring: is each 4.7 ms scatter
(a) fixed-cost dominated  -> batch 18 scatters into fewer, bigger ones;
(b) per-update (tile-RMW) -> dedup/segment-sum before scattering;
(c) insensitive to order  -> or does sorting indices help?

Times, inside ONE jit with k repeats (amortizes the ~28 ms tunnel floor):
  scatter of N updates for N in {24576, 98304, 3*98304, 18*98304}
  same N pre-sorted by index
  sort+segment-sum dedup to unique indices, then scatter uniques
Run: nohup python -u scripts/scatter_scaling.py > /tmp/scat_scale.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

HW = 524288  # 512*1024 envmap pixels
D = 12       # packed 4 taps x 3 channels

rng = np.random.default_rng(0)


def make_idx(n):
    # bilinear footprints of real rays cluster: draw from a blurred
    # hemisphere-ish band like escaped bunny-scene rays do
    base = rng.integers(0, HW, size=n, dtype=np.int32)
    return jnp.asarray(base)


def timed(fn, *args, k=10, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0].sum())  # force
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(*args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def scat(tab, idx, upd):
    return tab.at[:, idx].add(upd.T)


def scat3(tab, i1, u1, i2, u2, i3, u3):
    # three separate scatters (the current structure per chunk)
    tab = tab.at[:, i1].add(u1.T)
    tab = tab.at[:, i2].add(u2.T)
    tab = tab.at[:, i3].add(u3.T)
    return tab


def scat_merged(tab, i1, u1, i2, u2, i3, u3):
    idx = jnp.concatenate([i1, i2, i3])
    upd = jnp.concatenate([u1, u2, u3])
    return tab.at[:, idx].add(upd.T)


def scat_sorted(tab, idx, upd):
    order = jnp.argsort(idx)
    return tab.at[:, idx[order]].add(upd[order].T)


def scat_dedup(tab, idx, upd):
    # sort by index, segment-sum runs, scatter one update per unique index
    order = jnp.argsort(idx)
    si = idx[order]
    su = upd[order]
    csum = jnp.cumsum(su, axis=0)
    is_last = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    # exclusive prefix at the start of each run
    run_end = jnp.where(is_last[:, None], csum, 0.0)
    # subtract previous run's end: gather last-of-previous via shifted cumsum
    last_pos = jnp.where(is_last, jnp.arange(si.shape[0]), -1)
    prev_end = jnp.concatenate([jnp.zeros((1, D)), csum[:-1]])
    prev_is_last = jnp.concatenate([jnp.zeros((1,), bool), is_last[:-1]])
    # per-run totals = csum[last] - csum[last of previous run]; compute via
    # masked max-scan of prev run-end values
    prev_run_csum = jax.lax.associative_scan(
        lambda a, b: jnp.where(jnp.isnan(b[..., :1]), a, b),
        jnp.where(prev_is_last[:, None], prev_end, jnp.nan), axis=0)
    prev_run_csum = jnp.nan_to_num(prev_run_csum)
    totals = csum - prev_run_csum
    uidx = jnp.where(is_last, si, 0)
    uupd = jnp.where(is_last[:, None], totals, 0.0)
    return tab.at[:, uidx].add(uupd.T)


def main():
    print("backend:", jax.default_backend(), flush=True)
    tab = jnp.zeros((D, HW), jnp.float32)
    for n in (24576, 98304, 3 * 98304, 18 * 98304):
        idx = make_idx(n)
        upd = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
        t = timed(scat, tab, idx, upd)
        ts = timed(scat_sorted, tab, idx, upd)
        print(f"N={n:8d}  scatter {t:7.2f} ms   argsort+scatter {ts:7.2f} ms",
              flush=True)
    n = 98304
    i1, i2, i3 = (make_idx(n) for _ in range(3))
    u1, u2, u3 = (jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
                  for _ in range(3))
    t3 = timed(scat3, tab, i1, u1, i2, u2, i3, u3)
    tm = timed(scat_merged, tab, i1, u1, i2, u2, i3, u3)
    print(f"3x{n}: separate {t3:7.2f} ms   merged {tm:7.2f} ms", flush=True)
    idx = make_idx(18 * n)
    upd = jnp.asarray(rng.standard_normal((18 * n, D)), jnp.float32)
    td = timed(scat_dedup, tab, idx, upd)
    print(f"N={18*n}: dedup(sort+segsum+scatter-unique) {td:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()


def row_vs_col():
    """Row-scatter (HW, 12) vs column-scatter (12, HW) at the envmap shape.

    In-context evidence (envprof_r4b): the (4980, 33) table-grad ROW
    scatters run ~8.5 ns/update while the (12, 524288) packed-envmap
    COLUMN scatters run ~48 ns/update.  If row direction wins here too,
    the packed bilinear backward should flatten to (HW, 12) rows."""
    print("backend:", jax.default_backend(), flush=True)
    n = 98304
    idx = make_idx(n)
    upd = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    tab_c = jnp.zeros((D, HW), jnp.float32)
    tab_r = jnp.zeros((HW, D), jnp.float32)

    def col(tab, idx, upd):
        return tab.at[:, idx].add(upd.T)

    def row(tab, idx, upd):
        return tab.at[idx].add(upd)

    def row_unpack(tab, idx, upd):
        # row scatter + the extra unpack transpose the real path would pay
        out = tab.at[idx].add(upd)
        return out.reshape(512, 1024, D).sum()  # stand-in readback shape

    tc = timed(col, tab_c, idx, upd)
    tr = timed(row, tab_r, idx, upd)
    tru = timed(row_unpack, tab_r, idx, upd)
    print(f"N={n}: col-scatter(12,HW) {tc:7.2f} ms  row-scatter(HW,12) "
          f"{tr:7.2f} ms  row+unpack {tru:7.2f} ms", flush=True)
