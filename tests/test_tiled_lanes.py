"""Tiled lane order (Film.tiled): a pure relabeling of the lane->pixel map
for BVH-scene traversal coherence — images must be IDENTICAL to scanline
order (RNG is keyed by true pixel id; develop() inverts the layout)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.film import (
    Film, film_tiled, pixel_to_seq, seq_to_pixel, to_pixel_major,
)


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("llvm_ad_rgb")
    yield


def test_seq_pixel_roundtrip():
    film = Film(width=96, height=64, tiled=True)
    assert film_tiled(film)
    i = jnp.arange(96 * 64, dtype=jnp.uint32)
    p = seq_to_pixel(film, i)
    assert sorted(np.asarray(p).tolist()) == list(range(96 * 64))
    np.testing.assert_array_equal(np.asarray(pixel_to_seq(film, p)), np.asarray(i))


def test_to_pixel_major_inverts_lane_order():
    film = Film(width=64, height=32, tiled=True)
    n_pix = 64 * 32
    spp = 2
    # values[k] = pixel id the lane belongs to
    p = seq_to_pixel(film, jnp.arange(n_pix, dtype=jnp.uint32))
    vals = jnp.repeat(p.astype(jnp.float32), spp)[:, None]
    out = to_pixel_major(film, vals, spp)
    expect = jnp.repeat(jnp.arange(n_pix, dtype=jnp.float32), spp)[:, None]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_non_divisible_film_disables_tiling():
    film = Film(width=50, height=32, tiled=True)
    assert not film_tiled(film)


def _cbox(w=64, h=64):
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = h
    return mi.load_dict(d)


def test_tiled_render_identical_to_scanline():
    scene = _cbox()
    a = np.asarray(mi.render(scene, spp=4, seed=3))
    scene_t = scene.replace(film=scene.film.replace(tiled=True))
    b = np.asarray(mi.render(scene_t, spp=4, seed=3))
    np.testing.assert_array_equal(a, b)


def test_tiled_render_test_identical():
    scene = _cbox(w=128, h=64)
    a = np.asarray(mi.render_test(scene, spp=4, seed=1, sensor_count=2))
    scene_t = scene.replace(film=scene.film.replace(tiled=True))
    b = np.asarray(mi.render_test(scene_t, spp=4, seed=1, sensor_count=2))
    np.testing.assert_array_equal(a, b)
