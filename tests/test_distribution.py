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


def _implied_landing(d):
    """Exact (float64, zero-MC-noise) landing distribution encoded by an
    alias table: P(i) = (1/n) * (prob_i + sum_{j: alias_j==i} (1-prob_j))."""
    rows = np.asarray(d.alias_rows, np.float64)
    prob, alias = rows[:, 0], rows[:, 1].astype(np.int64)
    P = prob.copy()
    np.add.at(P, alias, 1.0 - prob)
    return P / rows.shape[0]


def test_alias_implied_landing_exact():
    """Deterministic table-exactness check (no Monte Carlo): the landing
    distribution implied by the packed alias rows must equal pmf/total up
    to f32 threshold packing (~1e-7 rel).  This is the real detector for
    builder bias — round 4's statistical gate was a 1.0-1.5 sigma test
    whose 'failure' was pure MC noise (scripts/alias_bias_analysis.py:
    measured max rel 8.6e-8 here, full-pipeline chi-square z=-1.5).
    Ref contract: src/core/pmf.cpp:30-51 (sample_reuse exactness)."""
    n = 1 << 17
    rng = np.random.default_rng(1)
    pmf = jnp.asarray((rng.uniform(0.02, 1.0, n) ** 2).astype(np.float32))
    d = DiscreteDistribution.init(pmf).with_alias()
    assert d.needs_coin
    P = _implied_landing(d)
    p64 = np.asarray(pmf, np.float64)
    q = p64 / p64.sum()
    rel = np.abs(P - q) / q
    assert rel.max() < 5e-7, rel.max()
    # the pdf the sampler returns (pmf/total_f32) agrees with q too
    total32 = float(np.asarray(d.total))
    rel_pdf = np.abs(np.asarray(d.pmf, np.float64) / total32 - q) / q
    assert rel_pdf.max() < 5e-7, rel_pdf.max()


def test_alias_exact_coin_unbiased_at_big_n():
    """The exact-coin alias path (u_coin threaded from the samplers,
    2026-08-20): at large table sizes the in-cell fraction keeps only
    24 - log2(n) bits, so the coin-from-fraction fallback QUANTIZES the
    self-vs-alias probability; the independent coin restores the exact
    landing distribution.  Statistical end-to-end check on a n=2^17
    table, properly powered (VERDICT r4 next #1):

    * inverse-pdf estimator E[1[x in S]/pdf(x)] == |S|, float64
      accumulation, gated at 4.5 sigma of its EXACT per-sample variance
      Var = sum_{i in S} 1/q_i - |S|^2 (computable from the pmf; SE is
      0.34-0.49% rel at m=2^21 — the old fixed 5e-3 gate was a 1.0-1.5
      sigma test that an exact sampler fails ~13% of the time);
    * full-pipeline landing-count chi-square vs pmf/total, |z| < 5.
    """
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
    pdf = np.asarray(p, np.float64)
    p64 = np.asarray(pmf, np.float64)
    q = p64 / p64.sum()
    for lo, hi in ((0, n // 3), (n // 3, n)):
        sel = (idx >= lo) & (idx < hi)
        est = np.where(sel, 1.0 / np.maximum(pdf, 1e-300), 0.0).mean()
        expect = float(hi - lo)
        var = (1.0 / q[lo:hi]).sum() - expect**2
        tol = 4.5 * np.sqrt(var / m) / expect
        assert abs(est / expect - 1.0) < tol, (lo, hi, est, tol)
    counts = np.bincount(idx, minlength=n).astype(np.float64)
    chi2 = ((counts - m * q) ** 2 / (m * q)).sum()
    z = (chi2 - (n - 1)) / np.sqrt(2.0 * (n - 1))
    assert abs(z) < 5.0, z
    u2 = np.asarray(u2)
    assert 0.0 <= u2.min() and u2.max() <= 1.0
    # the reused fraction keeps 24 - log2(n) = 7 bits: it lives on the
    # floor grid {0, 1/128, ..., 127/128} whose mean is 0.5 - 2^-8
    # (same entropy limit as the reference's sample_reuse, pmf.cpp:30-51)
    assert abs(u2.mean() - (0.5 - 2.0**-8)) < 1e-3


def test_alias_table_size_guard():
    """f32-packed alias indices are exact only below 2^24 entries; the
    builder must refuse bigger tables instead of silently corrupting."""
    big = jnp.ones(1 << 24, jnp.float32)
    d = DiscreteDistribution.init(big)
    import pytest
    with pytest.raises(AssertionError, match="2\\^24"):
        d.with_alias()
