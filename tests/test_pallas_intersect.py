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
    _, ray, _, _, _ = make_wavefront(scene, jnp.uint32(3), 0, n, 0, 4, 4, 0)
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
    _, ray, _, _, _ = make_wavefront(scene, jnp.uint32(5), 0, n, 0, 4, 4, 0)
    table = build_tri_table(scene.geometry)
    n_tri = jnp.asarray([scene.geometry.n_tris], jnp.int32)
    maxt = jnp.where(jnp.arange(n) % 2 == 0, jnp.inf, -jnp.inf)  # half disabled
    t, p, u, v = tri_intersect(table, n_tri, ray.o, ray.d, maxt)
    p = np.asarray(p)
    assert (p[1::2] == -1).all()       # disabled lanes never hit
    assert (p[0::2] >= 0).any()


def _random_tri_soup(n_tris, seed=7):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-10, 10, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 1.5, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 1.5, (n_tris, 3)).astype(np.float32)
    return v0, e1, e2


def test_bvh_sweep_matches_xla_traversal():
    """The Pallas block-traversal kernel (ops/bvh_sweep.py, interpret mode on
    CPU) must agree with the XLA while_loop traversal (render/bvh.py) on the
    same wide-leaf BVH."""
    from mitsuba_tpu import native as native_mod
    from mitsuba_tpu.ops.bvh_sweep import bvh_sweep_intersect, MAX_WIDE_LEAF
    from mitsuba_tpu.render.bvh import bvh_intersect

    v0, e1, e2 = _random_tri_soup(3000)
    tris9 = np.concatenate([v0, e1, e2], axis=-1)
    nodes, order = native_mod.build_bvh_wide(tris9, max_leaf=MAX_WIDE_LEAF)
    v0, e1, e2 = v0[order], e1[order], e2[order]

    rng = np.random.default_rng(11)
    N = 1024
    o = rng.uniform(-15, 15, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    maxt = np.full((N,), np.inf, np.float32)

    lo, hi = nodes[:, 0:3], nodes[:, 3:6]
    skip = nodes[:, 6].view(np.int32)
    payload = nodes[:, 7].view(np.int32)
    t_x, p_x, u_x, v_x = bvh_intersect(
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(skip), jnp.asarray(payload),
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(maxt),
    )
    nbox = jnp.asarray(np.concatenate([lo, hi], axis=-1))
    nmeta = jnp.asarray(np.stack([skip, payload], axis=-1))
    t_s, p_s, u_s, v_s = bvh_sweep_intersect(
        nbox, nmeta, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(maxt),
    )
    assert np.array_equal(np.asarray(p_x), np.asarray(p_s))
    np.testing.assert_allclose(np.asarray(t_x), np.asarray(t_s), rtol=1e-6)
    hit = np.asarray(p_x) >= 0
    np.testing.assert_allclose(np.asarray(u_x)[hit], np.asarray(u_s)[hit], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_x)[hit], np.asarray(v_s)[hit], rtol=1e-5, atol=1e-6)


def test_bvh_sweep_occlusion():
    """Any-hit kernel agrees with closest-hit validity (interpret mode)."""
    from mitsuba_tpu import native as native_mod
    from mitsuba_tpu.ops.bvh_sweep import (
        bvh_sweep_intersect, bvh_sweep_occluded, MAX_WIDE_LEAF,
    )

    v0, e1, e2 = _random_tri_soup(2000, seed=5)
    tris9 = np.concatenate([v0, e1, e2], axis=-1)
    nodes, order = native_mod.build_bvh_wide(tris9, max_leaf=MAX_WIDE_LEAF)
    v0, e1, e2 = v0[order], e1[order], e2[order]

    rng = np.random.default_rng(13)
    N = 512
    o = rng.uniform(-15, 15, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    maxt = np.full((N,), np.inf, np.float32)

    nbox = jnp.asarray(np.concatenate([nodes[:, 0:3], nodes[:, 3:6]], -1))
    nmeta = jnp.asarray(
        np.stack([nodes[:, 6].view(np.int32), nodes[:, 7].view(np.int32)], -1)
    )
    args = (nbox, nmeta, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(maxt))
    _, p, _, _ = bvh_sweep_intersect(*args)
    occ = bvh_sweep_occluded(*args)
    assert np.array_equal(np.asarray(occ), np.asarray(p) >= 0)
