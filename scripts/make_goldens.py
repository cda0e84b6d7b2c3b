"""Generate the golden EXRs for tests/test_goldens.py (run once per
intentional behavior change; reference: src/render/tests/test_renders.py's
ref images).  Usage:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/make_goldens.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mitsuba_tpu as mi
from mitsuba_tpu.utils.io import write_exr

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "golden")

SPP = 512
SEED = 7


def golden_configs():
    """(name, variant, scene dict, spp) — one per major transport mode."""
    cbox = mi.cornell_box()
    cbox["sensor"]["film"]["width"] = 32
    cbox["sensor"]["film"]["height"] = 32

    cbox_vol = mi.cornell_box()
    cbox_vol["sensor"]["film"]["width"] = 32
    cbox_vol["sensor"]["film"]["height"] = 32
    cbox_vol["integrator"] = {"type": "volpath", "max_depth": 8}
    cbox_vol["fog"] = {
        "type": "cube",
        "to_world": [{"type": "scale", "value": [0.4, 0.4, 0.4]}],
        "bsdf": {"type": "null"},
        "interior": {
            "type": "homogeneous", "sigma_t": [1.5, 1.5, 1.5],
            "albedo": [0.8, 0.8, 0.8], "phase": {"type": "hg", "g": 0.3},
        },
    }

    ocean = {
        "type": "scene",
        "integrator": {"type": "volpathaos", "max_depth": 6},
        "sensor": {
            "type": "perspective", "fov": 50,
            "to_world": [{"type": "look_at", "origin": [0, 0, 3],
                          "target": [0.5, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 32, "height": 32,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 16},
        },
        "sun": {"type": "directional", "direction": [0.3, 0.0, -0.95],
                "irradiance": [1.0, 1.0, 1.0]},
        "sky": {"type": "constant", "radiance": [0.1, 0.1, 0.12]},
        "surface": {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": [50.0, 50.0, 1.0]}],
            "bsdf": {"type": "roughdielectric", "int_ior": 1.33, "alpha": 0.1},
            "interior": {
                "type": "homogeneous", "sigma_t": [0.5, 0.4, 0.3],
                "albedo": [0.8, 0.85, 0.9], "phase": {"type": "rayleigh"},
            },
        },
    }

    mats = mi.cornell_box()
    mats["sensor"]["film"]["width"] = 32
    mats["sensor"]["film"]["height"] = 32
    mats["small-box"]["bsdf"] = {
        "type": "principled", "base_color": {"type": "rgb", "value": [0.7, 0.4, 0.2]},
        "metallic": 0.6, "roughness": 0.3,
    }
    mats["large-box"]["bsdf"] = {"type": "roughconductor", "alpha": 0.2}

    return [
        ("cbox_path", "rgb", cbox, SPP),
        ("cbox_volpath_fog", "rgb", cbox_vol, 256),
        ("ocean_aos", "rgb", ocean, 256),
        ("cbox_materials", "rgb", mats, 256),
    ]


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, variant, d, spp in golden_configs():
        mi.set_variant(variant)
        img = np.asarray(mi.render(mi.load_dict(d), spp=spp, seed=SEED))
        write_exr(os.path.join(OUT, f"{name}.exr"), img)
        print(f"{name}: mean={img.mean():.5f} max={img.max():.3f}")


if __name__ == "__main__":
    main()
