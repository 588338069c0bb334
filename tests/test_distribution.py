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
