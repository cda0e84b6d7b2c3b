"""instance/shapegroup (reference: src/shapes/{instance,shapegroup}.cpp).
Instances are baked into the flat SoA geometry at load time with composed
transforms (see scene_loader._expand_instances docstring)."""
import numpy as np
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _base():
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "light": {"type": "constant", "radiance": 1.0},
        "sensor": {
            "type": "perspective", "fov": 60,
            "to_world": {"type": "lookat", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]},
            "film": {"type": "hdrfilm", "width": 48, "height": 32},
        },
    }


S1 = {"type": "sphere", "radius": 0.3,
      "bsdf": {"type": "diffuse", "reflectance": [0.8, 0.2, 0.2]}}
S2 = {"type": "cube",
      "to_world": [{"type": "scale", "value": 0.2},
                   {"type": "translate", "value": [0, 0.6, 0]}],
      "bsdf": {"type": "diffuse", "reflectance": [0.2, 0.8, 0.2]}}
T1 = [{"type": "translate", "value": [-0.8, 0, 0]}]
T2 = [{"type": "rotate", "axis": [0, 0, 1], "angle": 90},
      {"type": "translate", "value": [0.8, 0, 0]}]


def test_instances_match_manual_flattening():
    d = _base()
    d["grp"] = {"type": "shapegroup", "s1": dict(S1), "s2": dict(S2)}
    d["i1"] = {"type": "instance", "shapegroup": {"type": "ref", "id": "grp"},
               "to_world": T1}
    d["i2"] = {"type": "instance", "shapegroup": {"type": "ref", "id": "grp"},
               "to_world": T2}
    img_inst = np.asarray(mi.render(mi.load_dict(d), spp=16, seed=0))

    from mitsuba_tpu.core.transform import build_transform

    m = _base()
    for iname, T in (("i1", T1), ("i2", T2)):
        for sname, s in (("s1", S1), ("s2", S2)):
            c = dict(s)
            c["to_world"] = build_transform(T) @ build_transform(
                s.get("to_world", [])
            )
            m[f"{iname}.{sname}"] = c
    img_manual = np.asarray(mi.render(mi.load_dict(m), spp=16, seed=0))

    np.testing.assert_array_equal(img_inst, img_manual)
    assert np.isfinite(img_inst).all() and img_inst.std() > 0.01


def test_instance_unknown_group_raises():
    d = _base()
    d["i"] = {"type": "instance", "shapegroup": {"type": "ref", "id": "nope"}}
    with pytest.raises(ValueError):
        mi.load_dict(d)
