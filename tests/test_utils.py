"""Utility-layer tests: EXR IO round trip, XML round trip, LargeSteps,
tonemap, polvis (reference coverage: src/core/tests/test_bitmap.py,
test_xml.py; ad/largesteps.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.utils.io import read_exr, write_exr


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    back, names = read_exr(p)
    assert names == ["R", "G", "B"]
    np.testing.assert_array_equal(back, img)


def test_exr_stokes_channels(tmp_path):
    img = np.random.default_rng(1).random((8, 8, 4)).astype(np.float32)
    p = str(tmp_path / "s.exr")
    write_exr(p, img, channel_names=["I", "Q", "U", "V"])
    back, names = read_exr(p)
    assert sorted(names) == ["I", "Q", "U", "V"]


def test_xml_roundtrip_renders_identically(tmp_path):
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    p = str(tmp_path / "scene.xml")
    mi.dict_to_xml(d, p)
    a = np.asarray(mi.render(mi.load_dict(d), spp=8, seed=2))
    b = np.asarray(mi.render(mi.load_file(p), spp=8, seed=2))
    np.testing.assert_array_equal(a, b)


def test_largesteps_roundtrip_and_smoothing():
    k = 12
    ij = np.stack(
        np.meshgrid(np.arange(k + 1), np.arange(k + 1), indexing="ij"), -1
    ).reshape(-1, 2)
    verts = np.concatenate([ij / k, np.zeros((len(ij), 1))], -1).astype(np.float32)
    faces = []
    for i in range(k):
        for j in range(k):
            a = i * (k + 1) + j
            faces += [[a, a + 1, a + k + 2], [a, a + k + 2, a + k + 1]]
    ls = mi.ad.LargeSteps(verts, np.asarray(faces), lambda_=19.0)
    u = ls.to_differential(jnp.asarray(verts))
    v = np.asarray(ls.from_differential(u))
    np.testing.assert_allclose(v, verts, atol=1e-5)
    spike = jnp.zeros_like(u).at[(k + 1) * (k // 2) + k // 2, 2].set(1.0)
    dv = np.asarray(ls.from_differential(spike))[:, 2].reshape(k + 1, k + 1)
    assert dv[k // 2, k // 2] > dv[k // 2, k // 2 + 1] > dv[0, 0] >= 0


def test_tonemap_monotone():
    from mitsuba_tpu.utils import tonemap

    x = np.linspace(0, 10, 100)
    for op in (tonemap.gamma, tonemap.reinhard, tonemap.aces):
        y = op(x)
        assert (np.diff(y) >= -1e-6).all()
        assert y.min() >= 0 and y.max() <= 1


def test_polvis_quantities():
    from mitsuba_tpu.utils import polvis

    s = np.asarray([2.0, 1.0, 1.0, 0.5])
    np.testing.assert_allclose(polvis.dolp(s), np.sqrt(2) / 2, atol=1e-6)
    np.testing.assert_allclose(polvis.dop(s), 0.75, atol=1e-6)
    np.testing.assert_allclose(polvis.aolp(s), np.pi / 8, atol=1e-6)
