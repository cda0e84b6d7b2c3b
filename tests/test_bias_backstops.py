"""Bias backstops under stress (VERDICT weak #10): the wavefront loops bound
their inner budgets (delta-tracking steps, NEE interface crossings, BVH
traversal steps).  These tests probe each boundary — proving the default
budgets are unbiased in regimes past typical use, and that the budgets
actually bind in the documented direction (darkening, never blow-up)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _slab(sigma_t, albedo=0.0, track_steps=32, nee_crossings=4,
          max_depth=3, n_plates=0, panel=False):
    """Radiancemeter at z=-3 looking along +z through a unit-thickness
    homogeneous slab (z in [-0.5, 0.5]).  panel=True adds an area panel at
    z=+2 (direct transmittance target: exp(-sigma_t)); n_plates adds null
    plates between the slab and the overhead directional sun (NEE crossing
    stress)."""
    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": max_depth,
                       "track_steps": track_steps,
                       "nee_crossings": nee_crossings},
        "medium_box": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [20.0, 20.0, 0.5]}],
            "bsdf": {"type": "null"},
            "interior": {"type": "homogeneous", "sigma_t": sigma_t,
                          "albedo": albedo},
        },
        "sensor": {
            "type": "radiancemeter",
            "to_world": [{"type": "look_at", "origin": [0, 0, -3],
                          "target": [0, 0, 1], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 1, "height": 1,
                     "rfilter": {"type": "box"}},
        },
    }
    if panel:
        d["panel"] = {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": 20.0},
                         {"type": "rotate", "axis": [1, 0, 0], "angle": 180},
                         {"type": "translate", "value": [0, 0, 2.0]}],
            "emitter": {"type": "area", "radiance": 1.0},
        }
    else:
        d["sun"] = {"type": "directional", "direction": [0, 0, -1],
                     "irradiance": 1.0}
    for i in range(n_plates):
        d[f"plate{i}"] = {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": 20.0},
                         {"type": "translate", "value": [0, 0, 0.7 + 0.05 * i]}],
            "bsdf": {"type": "null"},
        }
    return d


def _measure(d, spp=8192, seed=0):
    return float(np.asarray(mi.render_1(mi.load_dict(d), spp=spp, seed=seed))[0])


def test_tracking_budget_unbiased_at_moderate_optical_depth():
    """Default 32-step tracking: camera-ray transmittance through the slab
    matches exp(-tau) (binary-survival estimator; 3-sigma MC tolerance)."""
    for tau, spp in ((1.0, 8192), (4.0, 65536)):
        got = _measure(_slab(tau, panel=True, max_depth=2), spp=spp)
        want = np.exp(-tau)
        sigma = np.sqrt(want * (1 - want) / spp)
        assert abs(got - want) < 3 * sigma + 0.01 * want, (tau, got, want)


def test_tracking_budget_binds_when_starved():
    """Null-collision-heavy media (majorant >> local sigma_t) are where the
    step budget can bind: a spike voxel drives the constant majorant to ~12
    while the camera path sees sigma_t = 0.3, so crossing costs ~12 tracking
    steps.  The default 32 stays unbiased; a starved budget treats
    unresolved lanes as absorbed — darkening, never brightening."""
    grid = np.full((5, 5, 5, 1), 0.3, np.float32)
    grid[0, 0, 0, 0] = 12.0
    medium = {
        "type": "heterogeneous",
        "sigma_t": {"type": "gridvolume", "data": grid,
                     "bbox_min": [-20, -20, -0.5], "bbox_max": [20, 20, 0.5]},
        "albedo": 0.0,
    }
    want = np.exp(-0.3)

    def run(track_steps, spp=8192):
        d = _slab(0.0, panel=True, max_depth=2, track_steps=track_steps)
        d["medium_box"]["interior"] = medium
        return _measure(d, spp=spp)

    ok = run(32)
    assert abs(ok - want) < 0.03 * want, (ok, want)
    starved = run(2)
    assert 0.0 <= starved < 0.5 * want, (starved, want)


def test_nee_crossing_budget_suffices_and_binds():
    """Null plates between the slab and the sun are invisible, so the
    single-scatter NEE measurement must not change while the interface
    budget covers them — and must only DARKEN once it binds."""
    base = _measure(_slab(0.5, albedo=1.0))                     # no plates
    assert base > 1e-4, base
    within = _measure(_slab(0.5, albedo=1.0, n_plates=2))       # 3 <= 4
    np.testing.assert_allclose(within, base, rtol=0.05)
    starved = _measure(_slab(0.5, albedo=1.0, n_plates=6))      # 7 > 4
    assert starved < 0.6 * base, (starved, base)
    fixed = _measure(_slab(0.5, albedo=1.0, n_plates=6, nee_crossings=9))
    np.testing.assert_allclose(fixed, base, rtol=0.05)


def test_bvh_traversal_complete_vs_bruteforce():
    """BVH closest-hit equals brute-force on a mesh above the SMEM kernel's
    size cutoff: the 4096-step traversal cap must never bind on real scenes
    (missed hits would silently bias every big-mesh render)."""
    from mitsuba_tpu.render import shapes as SH
    from mitsuba_tpu.render.records import Ray

    rs = np.random.RandomState(0)
    # 6000 random small triangles in the unit cube (> SMEM cutoff)
    c = rs.rand(6000, 3).astype(np.float32)
    v0 = c
    v1 = c + 0.02 * rs.rand(6000, 3).astype(np.float32)
    v2 = c + 0.02 * rs.rand(6000, 3).astype(np.float32)
    verts = np.concatenate([v0, v1, v2], axis=0)
    faces = np.arange(18000, dtype=np.int32).reshape(3, 6000).T
    mesh = {"vertices": verts, "faces": faces, "shape_index": 0}
    geom = SH.build_geometry([mesh], [])
    assert geom.has_bvh

    n = 512
    o = rs.rand(n, 3).astype(np.float32) * 2.0 - 0.5
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray(o=jnp.asarray(o), d=jnp.asarray(d),
              maxt=jnp.full((n,), np.inf, jnp.float32))
    pi = SH.ray_intersect_preliminary(geom, ray)

    # brute force reference in float64 numpy (Moller-Trumbore)
    e1 = (v1 - v0).astype(np.float64)
    e2 = (v2 - v0).astype(np.float64)
    t_ref = np.full(n, np.inf)
    for i in range(n):
        pvec = np.cross(d[i].astype(np.float64), e2)
        det = np.einsum("ij,ij->i", e1, pvec)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o[i].astype(np.float64) - v0
        u = np.einsum("ij,ij->i", tvec, pvec) * inv
        qvec = np.cross(tvec, e1)
        vv = np.einsum("j,ij->i", d[i].astype(np.float64), qvec) * inv
        t = np.einsum("ij,ij->i", e2, qvec) * inv
        hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > 1e-5)
        if hit.any():
            t_ref[i] = t[hit].min()

    t_got = np.asarray(pi.t)
    hit_ref = np.isfinite(t_ref)
    hit_got = np.isfinite(t_got)
    # no missed hits; distances match
    assert (hit_got == hit_ref).mean() > 0.998, (hit_got.sum(), hit_ref.sum())
    both = hit_got & hit_ref
    np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-3, atol=2e-4)
