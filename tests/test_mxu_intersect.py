"""MXU matmul intersection kernel (ops/intersect_mxu.py) equivalence with
the SMEM Moller-Trumbore kernel, plus an end-to-end render A/B."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.ops.intersect import _tri_intersect_impl


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield
    os.environ.pop("MI_TPU_MXU_INTERSECT", None)


def test_mxu_matches_smem_kernel():
    rng = np.random.default_rng(0)
    T, N = 37, 2000
    v0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    table = jnp.asarray(np.concatenate([v0, e1, e2], -1))
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    # mixed finite/disabled maxt exercises the shadow-ray contract too
    maxt = jnp.asarray(
        np.where(rng.uniform(size=N) < 0.1, -1.0, 1e9).astype(np.float32)
    )
    nt = jnp.asarray([T], jnp.int32)

    os.environ.pop("MI_TPU_MXU_INTERSECT", None)
    t0, p0, u0, w0 = (np.asarray(x) for x in
                      _tri_intersect_impl(table, nt, o, d, maxt))
    os.environ["MI_TPU_MXU_INTERSECT"] = "1"
    t1, p1, u1, w1 = (np.asarray(x) for x in
                      _tri_intersect_impl(table, nt, o, d, maxt))

    # identical hit set up to edge-grazing ties
    assert (p0 != p1).sum() <= 2
    m = (p0 >= 0) & (p0 == p1)
    assert m.sum() > 100
    assert np.abs(t0[m] - t1[m]).max() < 1e-4
    assert np.abs(u0[m] - u1[m]).max() < 1e-4
    assert np.abs(w0[m] - w1[m]).max() < 1e-4
    # disabled lanes stay misses
    assert (p1[np.asarray(maxt) < 0] == -1).all()


def test_mxu_render_matches():
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 32
    d["sensor"]["film"]["height"] = 32
    scene = mi.load_dict(d)
    os.environ.pop("MI_TPU_MXU_INTERSECT", None)
    a = np.asarray(mi.render(scene, spp=8, seed=0))
    os.environ["MI_TPU_MXU_INTERSECT"] = "1"
    b = np.asarray(mi.render(scene, spp=8, seed=0))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
