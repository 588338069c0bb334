"""DiscreteDistribution / HyperCubeDistribution sampling tests
(reference: src/core/pmf.cpp, src/core/cube_distrb.cpp)."""

import numpy as np
import jax.numpy as jnp

from psdr_jit_tpu.core.distribution import (
    DiscreteDistribution, HyperCubeDistribution,
)
from psdr_jit_tpu.core.sampler import Sampler


def test_discrete_histogram_matches_pmf():
    pmf = jnp.asarray([1.0, 3.0, 0.0, 2.0, 4.0])
    d = DiscreteDistribution.init(pmf)
    u = Sampler(0, jnp.arange(200_000, dtype=jnp.uint32)).next_1d()
    idx, p = d.sample(u)
    counts = np.bincount(np.asarray(idx), minlength=5) / 200_000
    expect = np.asarray(pmf) / 10.0
    np.testing.assert_allclose(counts, expect, atol=5e-3)
    # pdf returned matches the pmf entry
    np.testing.assert_allclose(
        np.asarray(p), expect[np.asarray(idx)], rtol=1e-6
    )


def test_discrete_sample_reuse_uniform():
    """The reused random number must stay uniform within the chosen bin
    (pmf.cpp:30-51)."""
    pmf = jnp.asarray([1.0, 3.0, 2.0])
    d = DiscreteDistribution.init(pmf)
    u = Sampler(1, jnp.arange(100_000, dtype=jnp.uint32)).next_1d()
    idx, p, u2 = d.sample_reuse(u)
    u2 = np.asarray(u2)
    assert u2.min() >= 0.0 and u2.max() <= 1.0
    for i in range(3):
        ui = u2[np.asarray(idx) == i]
        assert abs(ui.mean() - 0.5) < 5e-3
        assert abs(ui.var() - 1.0 / 12.0) < 5e-3


def test_discrete_zero_mass_never_sampled():
    pmf = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    d = DiscreteDistribution.init(pmf)
    u = Sampler(2, jnp.arange(50_000, dtype=jnp.uint32)).next_1d()
    idx, _, _ = d.sample_reuse(u)
    idx = np.asarray(idx)
    assert set(np.unique(idx)) <= {1, 3}


def _force_alias(d):
    """Attach the alias table regardless of size (the production path only
    builds it above SEARCHSORTED_DENSE_MAX)."""
    from psdr_jit_tpu.core.distribution import _build_alias_rows

    return DiscreteDistribution(
        pmf=d.pmf, cdf=d.cdf, alias_rows=_build_alias_rows(d.pmf)
    )


def test_alias_histogram_and_pdf_match_pmf():
    """Walker alias sampling (the big-table O(1)-gather path) draws exactly
    the pmf distribution and reports the same pdf as the CDF path."""
    rng = np.random.default_rng(0)
    pmf = jnp.asarray(rng.uniform(0.0, 1.0, 500).astype(np.float32) ** 3)
    d = _force_alias(DiscreteDistribution.init(pmf))
    n = 400_000
    u = Sampler(3, jnp.arange(n, dtype=jnp.uint32)).next_1d()
    idx, p, u2 = d.sample_reuse(u)
    idx = np.asarray(idx)
    expect = np.asarray(pmf) / float(np.asarray(pmf).sum())
    counts = np.bincount(idx, minlength=500) / n
    np.testing.assert_allclose(counts, expect, atol=2e-3)
    np.testing.assert_allclose(np.asarray(p), expect[idx], rtol=1e-5)
    # reused number stays uniform: aggregate moments
    u2 = np.asarray(u2)
    assert 0.0 <= u2.min() and u2.max() <= 1.0
    assert abs(u2.mean() - 0.5) < 2e-3
    assert abs(u2.var() - 1.0 / 12.0) < 2e-3


def test_alias_zero_mass_never_sampled():
    pmf = jnp.zeros(300).at[17].set(1.0).at[200].set(3.0)
    d = _force_alias(DiscreteDistribution.init(pmf))
    u = Sampler(4, jnp.arange(100_000, dtype=jnp.uint32)).next_1d()
    idx, p, _ = d.sample_reuse(u)
    assert set(np.unique(np.asarray(idx))) <= {17, 200}
    assert np.asarray(p).min() > 0.0


def test_with_alias_threshold():
    """with_alias() is a no-op for dense-path tables, attaches rows above."""
    small = DiscreteDistribution.init(jnp.ones(64)).with_alias()
    assert small.alias_rows is None
    big = DiscreteDistribution.init(jnp.ones(4096)).with_alias()
    assert big.alias_rows is not None and big.alias_rows.shape == (4096, 4)
    u = Sampler(5, jnp.arange(50_000, dtype=jnp.uint32)).next_1d()
    idx, p, u2 = big.sample_reuse(u)
    np.testing.assert_allclose(np.asarray(p), 1.0 / 4096, rtol=1e-5)


def test_hypercube_2d_warp():
    """Warped samples land in cells with frequency prop. to mass, the
    returned pdf matches pdf(), and pdf integrates to 1."""
    res = (4, 2)
    mass = jnp.arange(1.0, 9.0)  # 8 cells
    hc = HyperCubeDistribution.init(res, mass)
    s = Sampler(3, jnp.arange(200_000, dtype=jnp.uint32))
    samples = s.next_2d()
    warped, pdf = hc.sample_reuse(samples)
    warped, pdf = np.asarray(warped), np.asarray(pdf)
    assert warped.min() >= 0.0 and warped.max() <= 1.0

    cell = (warped[:, 0] * 4).astype(int) * 2 + (warped[:, 1] * 2).astype(int)
    counts = np.bincount(cell, minlength=8) / 200_000
    expect = np.arange(1.0, 9.0) / 36.0
    np.testing.assert_allclose(counts, expect, atol=5e-3)

    np.testing.assert_allclose(
        np.asarray(hc.pdf(jnp.asarray(warped))), pdf, rtol=1e-5
    )
    # MC integral of the density over the square via uniform samples
    unif = np.asarray(Sampler(9, jnp.arange(100_000, dtype=jnp.uint32)).next_2d())
    dens = np.asarray(hc.pdf(jnp.asarray(unif)))
    assert abs(dens.mean() - 1.0) < 2e-2


def test_hypercube_3d_cell_coords_roundtrip():
    hc = HyperCubeDistribution.init((5, 3, 2), jnp.ones(30))
    idx = jnp.arange(30, dtype=jnp.int32)
    coords = np.asarray(hc.cell_coords(idx))
    flat = coords[:, 0] * 6 + coords[:, 1] * 2 + coords[:, 2]
    np.testing.assert_array_equal(flat, np.arange(30))


def test_alias_exact_coin_unbiased_at_big_n():
    """The exact-coin alias path (u_coin threaded from the samplers,
    2026-08-20): at large table sizes the in-cell fraction keeps only
    24 - log2(n) bits, so the coin-from-fraction fallback QUANTIZES the
    self-vs-alias probability; the independent coin restores the exact
    landing distribution.  Checked on a n=2^17 table where the fallback's
    coin has 7 bits: aggregate bias of 1/pdf-weighted estimates must
    vanish (E[1[x in S]/pdf(x)] == |S| for any cell subset)."""
    n = 1 << 17
    rng = np.random.default_rng(1)
    pmf = jnp.asarray((rng.uniform(0.02, 1.0, n) ** 2).astype(np.float32))
    d = DiscreteDistribution.init(pmf).with_alias()
    assert d.needs_coin
    m = 1 << 21
    s = Sampler(7, jnp.arange(m, dtype=jnp.uint32))
    u = s.next_1d()
    coin = s.next_1d()
    idx, p, u2 = d.sample_reuse(u, coin)
    idx = np.asarray(idx)
    pdf = np.asarray(p)
    # inverse-pdf estimator of the count of cells in a subset: unbiased
    # only if the landing distribution equals pmf/total exactly
    for lo, hi in ((0, n // 3), (n // 3, n)):
        sel = (idx >= lo) & (idx < hi)
        est = np.where(sel, 1.0 / np.maximum(pdf, 1e-30), 0.0).mean()
        assert abs(est / (hi - lo) - 1.0) < 5e-3, (lo, hi, est)
    u2 = np.asarray(u2)
    assert 0.0 <= u2.min() and u2.max() <= 1.0
    assert abs(u2.mean() - 0.5) < 2e-3


def test_alias_table_size_guard():
    """f32-packed alias indices are exact only below 2^24 entries; the
    builder must refuse bigger tables instead of silently corrupting."""
    big = jnp.ones(1 << 24, jnp.float32)
    d = DiscreteDistribution.init(big)
    import pytest
    with pytest.raises(AssertionError, match="2\\^24"):
        d.with_alias()
