"""Full-dimension low-discrepancy sampling (reference: src/samplers/
{stratified,multijitter,orthogonal,ldsampler}.cpp supply ALL sample
dimensions; here every dim pair is an Owen-scrambled (0,2)-sequence over the
pixel's samples — core/rng.py LDS mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.core.rng import RNG


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def test_lds_pair_stratification():
    spp = 16
    pixel = jnp.zeros((spp,), jnp.uint32)
    sidx = jnp.arange(spp, dtype=jnp.uint32)
    rng = RNG(7, jnp.arange(spp, dtype=jnp.uint32), pixel=pixel, sidx=sidx, lds=True)
    for pair in range(4):
        x, y, rng = rng.next_2d()
        for arr in (x, y):
            strata = np.sort((np.asarray(arr) * spp).astype(int))
            assert (strata == np.arange(spp)).all()
        cells = set(zip((np.asarray(x) * 4).astype(int),
                        (np.asarray(y) * 4).astype(int)))
        assert len(cells) == 16          # (0,2)-sequence elementary intervals


def test_lds_next1d_consumes_pair_components():
    spp = 8
    rng = RNG(3, jnp.arange(spp, dtype=jnp.uint32),
              pixel=jnp.zeros((spp,), jnp.uint32),
              sidx=jnp.arange(spp, dtype=jnp.uint32), lds=True)
    a, rng = rng.next_1d()
    b, rng = rng.next_1d()
    # the two 1d draws are the two components of one stratified pair
    for arr in (a, b):
        strata = np.sort((np.asarray(arr) * spp).astype(int))
        assert (strata == np.arange(spp)).all()


def _render_cfg(sampler, spp, seed):
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    d["integrator"] = {"type": "path", "max_depth": 3}
    d["sensor"]["sampler"] = {"type": sampler, "sample_count": spp}
    return np.asarray(mi.render(mi.load_dict(d), spp=spp, seed=seed))


def test_sobol_reduces_render_variance():
    """Measured variance reduction at equal spp (VERDICT r1 item 7 done
    criterion)."""
    ref = _render_cfg("independent", 2048, 0)
    mse_ind = []
    mse_lds = []
    for seed in range(4):
        mse_ind.append(((_render_cfg("independent", 16, seed) - ref) ** 2).mean())
        mse_lds.append(((_render_cfg("sobol", 16, seed) - ref) ** 2).mean())
    mi_, ml = np.mean(mse_ind), np.mean(mse_lds)
    assert ml < 0.75 * mi_, (ml, mi_)


def test_lds_render_deterministic():
    a = _render_cfg("sobol", 8, 5)
    b = _render_cfg("sobol", 8, 5)
    np.testing.assert_array_equal(a, b)


def test_orthogonal_bose_stratification():
    """True OA sampler (Bose strength-2; reference: src/samplers/
    orthogonal.cpp): every dim's 1D projection over one pixel's p^2 samples
    has exactly p samples per stratum, and every pair of independent OA
    columns covers the p x p grid exactly once."""
    from mitsuba_tpu.core.rng import smallest_prime_resolution

    spp = 25
    p = smallest_prime_resolution(spp)
    assert p == 5
    assert smallest_prime_resolution(17) == 5   # rounds up to 25
    assert smallest_prime_resolution(4) == 2

    pixel = jnp.full((spp,), 11, jnp.uint32)
    sidx = jnp.arange(spp, dtype=jnp.uint32)
    rng = RNG(9, jnp.arange(spp, dtype=jnp.uint32), pixel=pixel, sidx=sidx,
              oa=p)
    dims = []
    for _ in range(6):
        u, rng = rng.next_1d()
        u = np.asarray(u)
        assert (u >= 0).all() and (u < 1).all()
        dims.append(u)
    # 1D projections: p samples in each of the p strata, for every dim
    for u in dims:
        counts = np.bincount((u * p).astype(int), minlength=p)
        assert (counts == p).all(), counts
    # 2D projections: any two distinct OA columns (dims j, j' with
    # (j-1) != (j'-1) mod p) hit each of the p*p coarse cells exactly once
    for a, b in [(0, 1), (1, 2), (2, 3), (0, 4), (3, 5)]:
        cells = set(zip((dims[a] * p).astype(int), (dims[b] * p).astype(int)))
        assert len(cells) == spp, (a, b, len(cells))


def test_orthogonal_render_runs():
    img_oa = _render_cfg("orthogonal", 25, 0)
    img_ind = _render_cfg("independent", 1024, 0)
    assert np.isfinite(img_oa).all()
    # unbiased: means agree within MC noise
    assert abs(img_oa.mean() - img_ind.mean()) / img_ind.mean() < 0.05
