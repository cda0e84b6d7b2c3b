"""General 2D warp distributions (reference: distr_2d.h Marginal2D /
Hierarchical2D; tested there by src/core/tests/test_distr_2d.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core.distr2d import Marginal2D, Hierarchical2D


def _density(H=8, W=16, seed=3):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.05, 1.0, size=(H, W)).astype(np.float32)


def _chi2_2d(sampler_pos, data, n=200_000, seed=0):
    """Histogram sampled positions over the density grid; compare with
    expected cell masses (Pearson chi2, significance 0.01 as in the
    reference's chi2 harness, chi2.py:240)."""
    H, W = data.shape
    rng = np.random.default_rng(seed)
    u2 = jnp.asarray(rng.uniform(size=(n, 2)).astype(np.float32))
    pos, pdf = sampler_pos(u2)
    pos = np.asarray(pos)
    col = np.clip((pos[:, 0] * W).astype(int), 0, W - 1)
    row = np.clip((pos[:, 1] * H).astype(int), 0, H - 1)
    hist = np.zeros((H, W))
    np.add.at(hist, (row, col), 1.0)
    expected = data / data.sum() * n
    mask = expected > 5
    chi2 = ((hist[mask] - expected[mask]) ** 2 / expected[mask]).sum()
    dof = int(mask.sum()) - 1
    return chi2, dof


def _chi2_ok(chi2, dof):
    # 0.01-significance critical value via Wilson-Hilferty approximation
    z99 = 2.3263
    crit = dof * (1 - 2.0 / (9 * dof) + z99 * np.sqrt(2.0 / (9 * dof))) ** 3
    return chi2 < crit


@pytest.mark.parametrize("cls", [Marginal2D, Hierarchical2D])
def test_chi2_matches_density(cls):
    data = _density()
    d = cls.create(data)
    if cls is Hierarchical2D:
        # padded to 16x16: histogram in padded coords against padded data
        S = d.levels[-1].shape[0]
        padded = np.zeros((S, S), np.float32)
        padded[: data.shape[0], : data.shape[1]] = data
        data = padded
    chi2, dof = _chi2_2d(d.sample, data)
    assert _chi2_ok(chi2, dof), f"chi2={chi2:.1f} dof={dof}"


def test_sample_pdf_consistency():
    data = _density()
    d = Marginal2D.create(data)
    rng = np.random.default_rng(1)
    u2 = jnp.asarray(rng.uniform(size=(4096, 2)).astype(np.float32))
    pos, pdf = d.sample(u2)
    np.testing.assert_allclose(np.asarray(d.eval(pos)), np.asarray(pdf), rtol=1e-4)
    # 1/N sum 1/pdf over samples of the density integrates the unit square
    est = float(jnp.mean(1.0 / jnp.maximum(pdf, 1e-20)))
    assert abs(est - 1.0) < 0.05


def test_invert_roundtrip():
    data = _density()
    d = Marginal2D.create(data)
    rng = np.random.default_rng(2)
    u2 = jnp.asarray(rng.uniform(0.01, 0.99, size=(4096, 2)).astype(np.float32))
    pos, pdf = d.sample(u2)
    u2b, pdf_b = d.invert(pos)
    np.testing.assert_allclose(np.asarray(u2b), np.asarray(u2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pdf_b), np.asarray(pdf), rtol=1e-4)


def test_hierarchical_matches_marginal_pdf():
    data = _density(8, 8)
    m = Marginal2D.create(data)
    h = Hierarchical2D.create(data)
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(0.0, 0.999, size=(1024, 2)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(m.eval(pos)), np.asarray(h.eval(pos)), rtol=1e-5
    )
