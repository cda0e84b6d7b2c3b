"""Native runtime components: OBJ/PLY loaders + binned-SAH threaded BVH
(native/src/*.cpp via ctypes), and the large-mesh BVH render path."""
import struct as pystruct

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu import native as N


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def test_native_obj_loader(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"
    )
    m = N.load_obj(str(p))
    assert m["vertices"].shape == (4, 3)
    assert m["faces"].tolist() == [[0, 1, 2], [0, 2, 3]]
    assert "normals" in m and "uvs" in m


def test_native_ply_loader(tmp_path):
    p = tmp_path / "quad.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\nproperty float x\nproperty float y\nproperty float z\n")
        f.write(b"element face 2\nproperty list uchar int vertex_indices\nend_header\n")
        for v in [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]:
            f.write(pystruct.pack("<3f", *v))
        f.write(pystruct.pack("<B3i", 3, 0, 1, 2))
        f.write(pystruct.pack("<B3i", 3, 0, 2, 3))
    m = N.load_ply(str(p))
    assert m["vertices"].shape == (4, 3)
    assert m["faces"].tolist() == [[0, 1, 2], [0, 2, 3]]


def test_bvh_traversal_matches_brute():
    from mitsuba_tpu.render.bvh import bvh_intersect

    rng = np.random.default_rng(0)
    T = 3000
    c = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (T, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (T, 3)).astype(np.float32)
    tris = np.concatenate([c, e1, e2], -1)
    nodes, order = N.build_bvh(tris)
    tri = tris[order]

    Nr = 512
    o = rng.uniform(-15, 15, (Nr, 3)).astype(np.float32)
    d = rng.normal(size=(Nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t, p, u, v = bvh_intersect(
        jnp.asarray(nodes[:, 0:3]), jnp.asarray(nodes[:, 3:6]),
        jnp.asarray(nodes[:, 6].view(np.int32)), jnp.asarray(nodes[:, 7].view(np.int32)),
        jnp.asarray(tri[:, 0:3]), jnp.asarray(tri[:, 3:6]), jnp.asarray(tri[:, 6:9]),
        jnp.asarray(o), jnp.asarray(d), jnp.full((Nr,), np.inf, np.float32),
    )
    # brute force in numpy
    v0, be1, be2 = tri[:, 0:3], tri[:, 3:6], tri[:, 6:9]
    best = np.full(Nr, np.inf)
    for i in range(Nr):
        pv = np.cross(d[i], be2)
        det = (be1 * pv).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1 / np.where(det == 0, 1, det), 0)
        tv = o[i] - v0
        uu = (tv * pv).sum(-1) * inv
        qv = np.cross(tv, be1)
        vv = (d[i] * qv).sum(-1) * inv
        tt = (be2 * qv).sum(-1) * inv
        hit = ok & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 0)
        if hit.any():
            best[i] = tt[hit].min()
    got = np.asarray(t)
    agree = np.isclose(got, best, rtol=1e-5) | (np.isinf(got) & np.isinf(best))
    assert agree.mean() == 1.0


def _spherified_cube_obj(path, k=30):
    verts, faces = [], []
    for axis in range(3):
        for sgn in (-1.0, 1.0):
            base = len(verts)
            for i in range(k + 1):
                for j in range(k + 1):
                    uv = [-1 + 2 * i / k, -1 + 2 * j / k]
                    p = [0.0, 0.0, 0.0]
                    p[axis] = sgn
                    p[(axis + 1) % 3] = uv[0]
                    p[(axis + 2) % 3] = uv[1]
                    verts.append(p)
            for i in range(k):
                for j in range(k):
                    a = base + i * (k + 1) + j
                    b = a + 1
                    c = a + (k + 1)
                    d2 = c + 1
                    faces += [[a, b, d2], [a, d2, c]]
    V = np.asarray(verts, np.float32)
    V /= np.linalg.norm(V, axis=-1, keepdims=True)
    with open(path, "w") as f:
        for v in V:
            f.write("v %f %f %f\n" % tuple(v))
        for fc in faces:
            f.write("f %d %d %d\n" % (fc[0] + 1, fc[1] + 1, fc[2] + 1))
    return len(faces)


def test_large_mesh_bvh_furnace(tmp_path):
    """>SMEM-size mesh goes through the BVH path and conserves energy
    (twosided diffuse sidesteps test-mesh winding)."""
    p = str(tmp_path / "sphere.obj")
    nf = _spherified_cube_obj(p, k=30)   # 10800 tris > MAX_SMEM_TRIS
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 8, "rr_depth": 32},
        "sensor": {
            "type": "perspective", "fov": 30,
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 4], "target": [0, 0, 0], "up": [0, 1, 0]}
            ],
            "film": {"type": "hdrfilm", "width": 24, "height": 24, "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 32},
        },
        "env": {"type": "constant", "radiance": 1.0},
        "mesh": {
            "type": "obj", "filename": p,
            "bsdf": {"type": "twosided", "bsdf": {"type": "diffuse", "reflectance": 1.0}},
        },
    }
    scene = mi.load_dict(d)
    assert scene.geometry.has_bvh
    img = np.asarray(mi.render(scene, spp=64))
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.02)
