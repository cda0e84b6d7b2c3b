"""Catmull-Rom splines (reference: include/mitsuba/core/spline.h) and the
radical-inverse QMC family (reference: include/mitsuba/core/qmc.h)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import spline, qmc


# ---------------------------------------------------------------------------
# splines
# ---------------------------------------------------------------------------

def test_eval_1d_reproduces_cubics():
    """Catmull-Rom with one-sided end tangents is exact for quadratics."""
    x = np.linspace(0.0, 2.0, 9)
    f = 3.0 + 2.0 * x - 0.7 * x * x
    q = np.linspace(0.0, 2.0, 101)
    got = np.asarray(spline.eval_1d(0.0, 2.0, jnp.asarray(f), jnp.asarray(q)))
    want = 3.0 + 2.0 * q - 0.7 * q * q
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_eval_1d_interpolates_nodes():
    rs = np.random.RandomState(1)
    f = rs.rand(12).astype(np.float32)
    x = np.linspace(-1.0, 3.0, 12)
    got = np.asarray(spline.eval_1d(-1.0, 3.0, jnp.asarray(f), jnp.asarray(x)))
    np.testing.assert_allclose(got, f, atol=1e-5)


def test_eval_1d_nonuniform_matches_uniform_on_uniform_grid():
    rs = np.random.RandomState(2)
    f = rs.rand(10).astype(np.float32)
    nodes = np.linspace(0.0, 1.0, 10).astype(np.float32)
    q = rs.rand(50).astype(np.float32)
    a = np.asarray(spline.eval_1d(0.0, 1.0, jnp.asarray(f), jnp.asarray(q)))
    b = np.asarray(spline.eval_1d_nonuniform(jnp.asarray(nodes), jnp.asarray(f), jnp.asarray(q)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_integrate_and_invert_roundtrip():
    rs = np.random.RandomState(3)
    f = (0.2 + rs.rand(16)).astype(np.float32)   # positive -> monotone CDF
    cdf = np.asarray(spline.integrate_1d(0.0, 1.0, jnp.asarray(f)))
    assert cdf[0] == 0 and np.all(np.diff(cdf) > 0)
    # quadrature cross-check of the total integral
    xq = np.linspace(0, 1, 4001)
    fq = np.asarray(spline.eval_1d(0.0, 1.0, jnp.asarray(f), jnp.asarray(xq)))
    np.testing.assert_allclose(cdf[-1], np.trapezoid(fq, xq), rtol=1e-4)
    # invert_1d(F, F(x)) == x
    x = np.linspace(0.01, 0.99, 37)
    # build spline of the cdf at the nodes and query its values at x
    Fx = np.interp(x, np.linspace(0, 1, 16), cdf)  # monotone approx
    x_back = np.asarray(spline.invert_1d(0.0, 1.0, jnp.asarray(cdf), jnp.asarray(Fx)))
    np.testing.assert_allclose(x_back, x, atol=5e-3)


def test_sample_1d_chi2():
    """Samples of sample_1d follow the spline density (histogram test)."""
    f = np.array([0.1, 0.5, 2.0, 1.0, 0.3, 1.5, 0.8, 0.2], np.float32)
    n = 200_000
    u = (np.arange(n) + 0.5) / n
    x, pdf = spline.sample_1d(0.0, 1.0, jnp.asarray(f), jnp.asarray(u))
    x = np.asarray(x)
    pdf = np.asarray(pdf)
    assert ((x >= 0) & (x <= 1)).all()
    hist, edges = np.histogram(x, bins=40, range=(0.0, 1.0))
    centers = 0.5 * (edges[:-1] + edges[1:])
    dens = np.asarray(spline.eval_1d(0.0, 1.0, jnp.asarray(f), jnp.asarray(centers)))
    total = float(np.asarray(spline.integrate_1d(0.0, 1.0, jnp.asarray(f)))[-1])
    expect = np.maximum(dens, 0) / total * n * (edges[1] - edges[0])
    rel = np.abs(hist - expect) / np.maximum(expect, 1)
    assert np.median(rel) < 0.05, np.median(rel)
    # pdf returned matches density/total
    np.testing.assert_allclose(
        pdf, np.asarray(spline.eval_1d(0.0, 1.0, jnp.asarray(f), jnp.asarray(x))) / total,
        rtol=1e-3, atol=1e-5,
    )


def test_eval_2d_separable():
    """Bicubic on a separable field g(x)h(y) equals the product of 1D
    interpolants."""
    xn = np.linspace(0.0, 1.0, 7).astype(np.float32)
    yn = np.array([0.0, 0.1, 0.3, 0.6, 1.0], np.float32)
    g = 1.0 + xn
    h = 2.0 - yn
    vals = np.outer(h, g).astype(np.float32)   # [Ny, Nx]
    rs = np.random.RandomState(4)
    qx = rs.rand(30).astype(np.float32)
    qy = rs.rand(30).astype(np.float32)
    got = np.asarray(spline.eval_2d(jnp.asarray(xn), jnp.asarray(yn),
                                    jnp.asarray(vals), jnp.asarray(qx), jnp.asarray(qy)))
    gx = np.asarray(spline.eval_1d_nonuniform(jnp.asarray(xn), jnp.asarray(g.astype(np.float32)), jnp.asarray(qx)))
    hy = np.asarray(spline.eval_1d_nonuniform(jnp.asarray(yn), jnp.asarray(h.astype(np.float32)), jnp.asarray(qy)))
    np.testing.assert_allclose(got, gx * hy, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# qmc
# ---------------------------------------------------------------------------

def test_radical_inverse_base2_bitreversal():
    idx = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.uint32)
    got = np.asarray(qmc.radical_inverse(0, idx))
    want = [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_radical_inverse_base3():
    idx = jnp.asarray([0, 1, 2, 3, 4, 9], jnp.uint32)
    got = np.asarray(qmc.radical_inverse(1, idx))
    want = [0.0, 1 / 3, 2 / 3, 1 / 9, 1 / 3 + 1 / 9, 1 / 27]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_halton_low_discrepancy():
    """Star-discrepancy proxy: 2D Halton beats iid random by a wide margin."""
    n = 1024
    idx = jnp.arange(n, dtype=jnp.uint32)
    pts = np.stack([np.asarray(qmc.halton(idx, 0)), np.asarray(qmc.halton(idx, 1))], -1)
    rs = np.random.RandomState(0)
    rnd = rs.rand(n, 2)

    def disc(p):
        # max deviation over a grid of anchored boxes
        worst = 0.0
        for a in np.linspace(0.1, 1.0, 10):
            for b in np.linspace(0.1, 1.0, 10):
                frac = ((p[:, 0] < a) & (p[:, 1] < b)).mean()
                worst = max(worst, abs(frac - a * b))
        return worst

    assert disc(pts) < 0.3 * disc(rnd), (disc(pts), disc(rnd))


def test_scrambled_radical_inverse_is_permutation_consistent():
    """Scrambling preserves equidistribution: mean ~ 0.5, still stratified."""
    n = 2187
    idx = jnp.arange(n, dtype=jnp.uint32)
    got = np.asarray(qmc.scrambled_radical_inverse(1, idx))
    assert abs(got.mean() - 0.5) < 5e-3
    hist, _ = np.histogram(got, bins=27, range=(0, 1))
    assert hist.min() >= 70 and hist.max() <= 92, (hist.min(), hist.max())


def test_hammersley_first_dim():
    n = 64
    idx = jnp.arange(n, dtype=jnp.uint32)
    got = np.asarray(qmc.hammersley(idx, 0, n))
    np.testing.assert_allclose(got, (np.arange(n) + 0.5) / n, atol=1e-6)
