"""Pallas closest-hit kernel vs the XLA fallback (the kernel runs in
interpreter mode on CPU; on TPU it is the production path)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.ops.intersect import build_tri_table, tri_intersect
from mitsuba_tpu.render import shapes as SH
from mitsuba_tpu.render_api import make_wavefront


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _small_scene():
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    return mi.load_dict(d)


def test_pallas_matches_fallback():
    scene = _small_scene()
    n = 4096
    _, ray, _, _ = make_wavefront(scene, jnp.uint32(3), 0, n, 0, 4, 4, 0)
    act = jnp.ones(n, bool)

    # XLA fallback reference
    pi = SH.ray_intersect_preliminary(scene.geometry, ray, act)

    # Pallas kernel (interpret mode on CPU)
    table = build_tri_table(scene.geometry)
    n_tri = jnp.asarray([scene.geometry.n_tris], jnp.int32)
    t, p, u, v = tri_intersect(table, n_tri, ray.o, ray.d, ray.maxt)

    tp = np.asarray(t)
    tj = np.asarray(pi.t)
    both = np.isfinite(tp) & np.isfinite(tj)
    assert (np.isfinite(tp) == np.isfinite(tj)).all()
    np.testing.assert_allclose(tp[both], tj[both], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(pi.prim_index))
    np.testing.assert_allclose(
        np.stack([np.asarray(u), np.asarray(v)], -1)[both],
        np.asarray(pi.prim_uv)[both],
        atol=1e-5,
    )


def test_pallas_inactive_lanes():
    scene = _small_scene()
    n = 1024
    _, ray, _, _ = make_wavefront(scene, jnp.uint32(5), 0, n, 0, 4, 4, 0)
    table = build_tri_table(scene.geometry)
    n_tri = jnp.asarray([scene.geometry.n_tris], jnp.int32)
    maxt = jnp.where(jnp.arange(n) % 2 == 0, jnp.inf, -jnp.inf)  # half disabled
    t, p, u, v = tri_intersect(table, n_tri, ray.o, ray.d, maxt)
    p = np.asarray(p)
    assert (p[1::2] == -1).all()       # disabled lanes never hit
    assert (p[0::2] >= 0).any()
