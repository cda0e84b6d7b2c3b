"""cylinder / serialized / batch sensor / projector / directionalarea /
circular polarizer / specfilm
(reference: src/shapes/cylinder.cpp, serialized.cpp; src/sensors/batch.cpp;
src/emitters/{projector,directionalarea}.cpp; src/bsdfs/circular.cpp;
src/films/specfilm.cpp)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _reset():
    yield
    mi.set_variant("rgb")


def _meter(origin, target, spp=16, up=(0, 1, 0)):
    return {
        "type": "radiancemeter",
        "to_world": [
            {"type": "look_at", "origin": origin, "target": target, "up": list(up)}
        ],
        "film": {"type": "hdrfilm", "width": 1, "height": 1,
                 "rfilter": {"type": "box"}},
        "sampler": {"type": "independent", "sample_count": spp},
    }


def test_cylinder_silhouette_width():
    """A unit-radius cylinder along z seen side-on subtends the analytic
    angular width; probe via a depth-style hit test with the path tracer."""
    mi.set_variant("mono")
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "env": {"type": "constant", "radiance": 1.0},
        "cyl": {
            "type": "cylinder", "radius": 1.0,
            "p0": [0, 0, -5], "p1": [0, 0, 5],
            "bsdf": {"type": "diffuse", "reflectance": 0.0},  # black occluder
        },
        "sensor": {
            "type": "perspective", "fov": 60,
            "to_world": [
                {"type": "look_at", "origin": [-6, 0, 0], "target": [0, 0, 0], "up": [0, 0, 1]}
            ],
            "film": {"type": "hdrfilm", "width": 64, "height": 1,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 64},
        },
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=64, seed=1))[0, :, 0]
    # black fraction = angular width of the cylinder / fov
    frac_black = (img < 0.5).mean()
    half_angle = np.arcsin(1.0 / 6.0)
    expect = 2 * np.degrees(half_angle) / 60.0
    np.testing.assert_allclose(frac_black, expect, atol=0.04)


def test_serialized_roundtrip(tmp_path):
    """Write a .serialized file per the format spec and render it."""
    import zlib
    import struct as pystruct

    mi.set_variant("mono")
    # a single rectangle [-1,1]^2 at z=0, facing +z
    V = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float64)
    N = np.tile([0.0, 0.0, 1.0], (4, 1))
    F = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    flags = 0x0001 | 0x2000   # normals + double precision
    payload = pystruct.pack("<I", flags) + b"quad\x00"
    payload += pystruct.pack("<QQ", 4, 2)
    payload += V.astype("<f8").tobytes() + N.astype("<f8").tobytes()
    payload += F.astype("<u4").tobytes()
    blob = pystruct.pack("<HH", 0x041C, 4) + zlib.compress(payload)
    blob += pystruct.pack("<Q", 0) + pystruct.pack("<I", 1)
    p = tmp_path / "quad.serialized"
    p.write_bytes(blob)

    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sun": {"type": "directional", "direction": [0, 0, -1], "irradiance": 1.0},
        "quad": {
            "type": "serialized", "filename": str(p),
            "to_world": [{"type": "scale", "value": 40.0}],
            "bsdf": {"type": "diffuse", "reflectance": 0.6},
        },
        "sensor": _meter([0, 0, 5], [0, 0, 0]),
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=256, seed=2)).mean()
    np.testing.assert_allclose(img, 0.6 / np.pi, rtol=0.04)


def test_batch_sensor_two_views():
    """Batch sensor: left film half = camera A (sees red), right = camera B
    (sees green)."""
    mi.set_variant("rgb")
    def wall(name, y, color):
        return {
            "type": "rectangle",
            "to_world": [
                {"type": "scale", "value": 50.0},
                {"type": "look_at", "origin": [0, y, 0], "target": [0, 0, 0], "up": [0, 0, 1]},
            ],
            "emitter": {"type": "area", "radiance": {"type": "rgb", "value": color}},
            "bsdf": {"type": "diffuse", "reflectance": 0.0},
        }
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "red_wall": wall("red_wall", 5.0, [1, 0, 0]),
        "green_wall": wall("green_wall", -5.0, [0, 1, 0]),
        "sensor": {
            "type": "batch",
            "a": {"type": "perspective", "fov": 30,
                  "to_world": [{"type": "look_at", "origin": [0, 0, 0],
                                "target": [0, 5, 0], "up": [0, 0, 1]}]},
            "b": {"type": "perspective", "fov": 30,
                  "to_world": [{"type": "look_at", "origin": [0, 0, 0],
                                "target": [0, -5, 0], "up": [0, 0, 1]}]},
            "film": {"type": "hdrfilm", "width": 32, "height": 16,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 8},
        },
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=8, seed=0))
    left, right = img[:, :16], img[:, 16:]
    assert left[..., 0].mean() > 0.9 and left[..., 1].mean() < 0.1
    assert right[..., 1].mean() > 0.9 and right[..., 0].mean() < 0.1


def test_projector_lights_its_frustum():
    mi.set_variant("mono")
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "proj": {
            "type": "projector", "fov": 20, "irradiance": 4.0,
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 4], "target": [0, 0, 0], "up": [0, 1, 0]}
            ],
        },
        "floor": {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": 20.0}],
            "bsdf": {"type": "diffuse", "reflectance": 0.8},
        },
        "sensor": {
            "type": "perspective", "fov": 60,
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 6], "target": [0, 0, 0], "up": [0, 1, 0]}
            ],
            "film": {"type": "hdrfilm", "width": 32, "height": 32,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 16},
        },
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=64, seed=1))[..., 0]
    center = img[12:20, 12:20].mean()
    corner = img[:4, :4].mean()
    assert center > 10 * max(corner, 1e-6)   # lit spot inside the frustum only


def test_circular_polarizer_creates_v():
    """Unpolarized light through an ideal circular polarizer: I halves and
    |V|/I -> 1 (reference: src/bsdfs/circular.cpp)."""
    mi.set_variant("mono_polarized")
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "env": {"type": "constant", "radiance": 1.0},
        "screen": {
            "type": "rectangle",
            "to_world": [
                {"type": "scale", "value": 50.0},
                {"type": "look_at", "origin": [0, 0, 0], "target": [-1, 0, 0], "up": [0, 0, 1]},
            ],
            "bsdf": {"type": "circular"},
        },
        "sensor": _meter([-5, 0, 0], [0, 0, 0], up=(0, 0, 1)),
    }
    spec = np.asarray(mi.render_1(mi.load_dict(d), spp=256))
    I, Q, U, V = spec[:, 0]
    np.testing.assert_allclose(I, 0.5, atol=0.03)
    assert abs(V) / I > 0.95
    assert np.hypot(Q, U) / I < 0.05


def test_specfilm_band_integration():
    """specfilm with a narrow SRF around 550nm vs a flat SRF: a uniform
    (wavelength-constant) emitter gives equal channel responses scaled by
    each SRF's mean response."""
    mi.set_variant("spectral")
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "env": {"type": "constant", "radiance": {"type": "uniform", "value": 1.0}},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": [
                {"type": "look_at", "origin": [0, 0, 1], "target": [0, 0, 0], "up": [0, 1, 0]}
            ],
            "film": {
                "type": "specfilm", "width": 8, "height": 8,
                "rfilter": {"type": "box"},
                "band_flat": {"type": "uniform", "value": 1.0},
                "band_half": {"type": "uniform", "value": 0.5},
            },
            "sampler": {"type": "independent", "sample_count": 32},
        },
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=128, seed=4))
    assert img.shape == (8, 8, 2)
    # channels are SRF-weighted average radiances: both flat SRFs give the
    # emitter's radiance regardless of their absolute response scale
    np.testing.assert_allclose(img[..., 0].mean(), 1.0, rtol=0.02)
    np.testing.assert_allclose(img[..., 1].mean(), 1.0, rtol=0.02)
