"""Film: crop windows, exact negative-lobe reconstruction filters, invalid
splat guards (reference: film.cpp, imageblock.cpp, src/rfilters/*)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.film import (
    Film, develop, filter_eval_1d, mitchell_1d, lanczos_1d,
)


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def test_filter_kernels_normalized():
    """Integral of each 1D kernel is ~1 (partition of unity on the grid)."""
    x = np.linspace(-3, 3, 6001)
    for f in ("mitchell", "catmullrom", "lanczos"):
        v = np.asarray(filter_eval_1d(f, jnp.asarray(x)))
        integ = v.sum() * (x[1] - x[0])
        assert abs(integ - 1.0) < 5e-3, (f, integ)


def test_crop_window_matches_full_render():
    """A crop render equals the corresponding region of the full render
    (same per-pixel RNG would differ — crop changes lane->pixel mapping —
    so compare CONVERGED renders)."""
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 32
    d["sensor"]["film"]["height"] = 32
    full = np.asarray(mi.render(mi.load_dict(d), spp=512, seed=0))
    d["sensor"]["film"]["crop_offset_x"] = 8
    d["sensor"]["film"]["crop_offset_y"] = 4
    d["sensor"]["film"]["crop_width"] = 12
    d["sensor"]["film"]["crop_height"] = 16
    crop = np.asarray(mi.render(mi.load_dict(d), spp=512, seed=1))
    assert crop.shape == (16, 12, 3)
    ref = full[4:20, 8:20]
    err = np.abs(crop - ref) / np.maximum(ref, 0.05)
    assert np.median(err) < 0.08, np.median(err)


def test_mitchell_reconstruction_flat_field():
    """Weighted reconstruction preserves a constant field exactly (weights
    normalize out) and produces the crop-size image."""
    film = Film(width=8, height=8, rfilter="mitchell")
    spp = 4
    n = 64 * spp
    rng = np.random.default_rng(0)
    vals = jnp.ones((n, 3))
    jit = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    img = np.asarray(develop(film, vals, spp, jitter=jit))
    np.testing.assert_allclose(img, 1.0, rtol=1e-5)


def test_mitchell_sharpens_edges():
    """Negative lobes: a step edge reconstructed with mitchell overshoots
    (ringing) relative to the box average — proves the filter is really
    applied, not a gaussian stand-in."""
    W = H = 16
    spp = 64
    rng = np.random.default_rng(1)
    n = W * H * spp
    pix = np.arange(n) // spp
    px = pix % W
    vals = (px >= W // 2).astype(np.float32)[:, None] * np.ones((1, 3), np.float32)
    jit = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    img_m = np.asarray(
        develop(Film(width=W, height=H, rfilter="mitchell"), jnp.asarray(vals), spp, jitter=jit)
    )
    img_b = np.asarray(
        develop(Film(width=W, height=H, rfilter="box"), jnp.asarray(vals), spp)
    )
    # box stays within [0, 1]; mitchell undershoots below 0 next to the edge
    assert img_b.min() >= 0.0 and img_b.max() <= 1.0 + 1e-6
    assert img_m.min() < -0.005, img_m.min()
    assert img_m.max() > 1.005, img_m.max()


def test_mitchell_end_to_end_render():
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    d["sensor"]["film"]["rfilter"] = {"type": "mitchell"}
    img = np.asarray(mi.render(mi.load_dict(d), spp=16, seed=0))
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    # matches a box render in the mean (both unbiased in the flat limit)
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    img_b = np.asarray(mi.render(mi.load_dict(d), spp=16, seed=0))
    assert abs(img.mean() - img_b.mean()) / img_b.mean() < 0.05
