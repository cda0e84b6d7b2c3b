"""Scene-dict vocabulary parity: every plugin `type` name of the reference
(SURVEY.md Appendix A) must construct through mi.load_dict.

Reference: the plugin name lists in /root/reference/src/*/CMakeLists.txt and
SURVEY.md Appendix A 'Scene-dict vocabulary'.  This is a load-level test —
statistical/render behavior per plugin is covered by the chi2/golden suites.
"""
import numpy as np
import pytest

import mitsuba_tpu as mi


def base():
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective",
            "fov": 45,
            "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        "light": {"type": "constant", "radiance": {"type": "rgb", "value": [1, 1, 1]}},
        "obj": {"type": "sphere", "bsdf": {"type": "diffuse"}},
    }


def setup_module():
    mi.set_variant("llvm_ad_rgb")


@pytest.mark.parametrize("s", "independent stratified multijitter orthogonal ldsampler sobol".split())
def test_samplers(s):
    d = base()
    d["sensor"]["sampler"] = {"type": s, "sample_count": 4}
    mi.load_dict(d)


@pytest.mark.parametrize("r", "box tent gaussian mitchell catmullrom lanczos".split())
def test_rfilters(r):
    d = base()
    d["sensor"]["film"]["rfilter"] = {"type": r}
    mi.load_dict(d)


@pytest.mark.parametrize("p", ["isotropic", "hg", "rayleigh", "tabphase", "blendphase", "sggx"])
def test_phases(p):
    d = base()
    ph = {"type": p}
    if p == "hg":
        ph["g"] = 0.5
    if p == "tabphase":
        ph["values"] = "1,1,1"
    if p == "blendphase":
        ph.update({"weight": 0.5, "p0": {"type": "isotropic"}, "p1": {"type": "hg", "g": 0.3}})
    if p == "sggx":
        ph["S"] = [1.0, 1.0, 0.5, 0.0, 0.0, 0.0]
    d["obj"]["interior"] = {"type": "homogeneous", "sigma_t": [1, 1, 1],
                            "albedo": [0.5, 0.5, 0.5], "phase": ph}
    d["obj"]["bsdf"] = {"type": "null"}
    d["integrator"] = {"type": "volpath", "max_depth": 2}
    mi.load_dict(d)


@pytest.mark.parametrize("sd", "monodisperse gamma lognormal powerlaw".split())
def test_mie_sizedistrs(sd):
    d = base()
    sdd = {"type": sd, "min_radius": 0.5, "max_radius": 2.0} if sd != "monodisperse" \
        else {"type": sd, "radius": 1.0}
    if sd == "gamma":
        sdd.update({"a": 1.0, "b": 0.3})
    if sd == "lognormal":
        sdd.update({"mean_radius": 1.0, "std": 0.3})
    if sd == "powerlaw":
        sdd.update({"exponent": -3.0})
    d["obj"]["interior"] = {
        "type": "homogeneous", "sigma_t": [1, 1, 1], "albedo": [0.5, 0.5, 0.5],
        "phase": {"type": "mie", "wavelength": 550.0, "ior_med": 1.0,
                  "ior_sph": 1.33, "sizedistr": sdd, "nsteps": 8},
    }
    d["obj"]["bsdf"] = {"type": "null"}
    d["integrator"] = {"type": "volpath", "max_depth": 2}
    mi.load_dict(d)


@pytest.mark.parametrize("it", "path direct volpath volpathmis volpathaos aov stokes depth moment ptracer prb prb_basic prbvolpath prb_unpolarized prb_volpathaos direct_projective prb_projective".split())
def test_integrators(it):
    d = base()
    di = {"type": it}
    if it in ("stokes", "moment"):
        di["integrator"] = {"type": "path"}
    if it == "aov":
        di["aovs"] = "d:depth"
    d["integrator"] = di
    mi.load_dict(d)


def test_prb_polarized_needs_polarized_variant():
    d = base()
    d["integrator"] = {"type": "prb_polarized"}
    with pytest.raises(ValueError):
        mi.load_dict(d)


@pytest.mark.parametrize("sn", "perspective thinlens orthographic radiancemeter irradiancemeter batch distant".split())
def test_sensors(sn):
    d = base()
    s = {"type": sn, "film": {"type": "hdrfilm", "width": 8, "height": 8},
         "sampler": {"type": "independent", "sample_count": 4}}
    if sn in ("perspective", "thinlens"):
        s["fov"] = 45
    if sn == "distant":
        s["direction"] = [0, 0, -1]
    if sn == "batch":
        s["sensors"] = [{"type": "perspective", "fov": 45}]
    d["sensor"] = s
    mi.load_dict(d)


@pytest.mark.parametrize("em", "area point constant envmap directional directionalarea spot projector".split())
def test_emitters(em):
    d = base()
    if em in ("area", "directionalarea"):
        d["obj"]["emitter"] = {"type": em, "radiance": {"type": "rgb", "value": [1, 1, 1]}}
    elif em == "envmap":
        d["light"] = {"type": "envmap", "data": np.ones((4, 8, 3), np.float32)}
    elif em == "directional":
        d["light"] = {"type": "directional", "direction": [0, 0, -1],
                      "irradiance": {"type": "rgb", "value": [1, 1, 1]}}
    elif em == "spot":
        d["light"] = {"type": "spot", "intensity": {"type": "rgb", "value": [1, 1, 1]},
                      "cutoff_angle": 20}
    elif em == "projector":
        d["light"] = {"type": "projector", "irradiance": np.ones((4, 4, 3), np.float32), "fov": 45}
    elif em == "point":
        d["light"] = {"type": "point", "intensity": {"type": "rgb", "value": [1, 1, 1]},
                      "position": [0, 0, 2]}
    mi.load_dict(d)


@pytest.mark.parametrize("sp", "uniform regular irregular srgb d65 blackbody singleton".split())
def test_spectra(sp):
    d = base()
    spd = {"type": sp}
    if sp == "uniform":
        spd["value"] = 0.5
    if sp == "regular":
        # comma-separated string values: the reference's XML property spelling
        spd.update({"wavelength_min": 400, "wavelength_max": 700, "values": "0.2,0.5,0.3"})
    if sp == "irregular":
        spd.update({"wavelengths": "400,550,700", "values": "0.2,0.5,0.3"})
    if sp == "srgb":
        spd["color"] = [0.5, 0.3, 0.2]
    if sp == "blackbody":
        spd["temperature"] = 5500
    if sp == "singleton":
        spd.update({"wavelength": 550, "value": 1.0})
    d["obj"]["bsdf"] = {"type": "diffuse", "reflectance": spd}
    mi.load_dict(d)


@pytest.mark.parametrize("b", "diffuse dielectric thindielectric roughdielectric conductor roughconductor plastic roughplastic principled principledthin principled_thin blendbsdf mask null twosided bumpmap normalmap hair polarizer retarder circular pplastic".split())
def test_bsdfs(b):
    d = base()
    bs = {"type": b}
    if b == "blendbsdf":
        bs.update({"weight": 0.5, "b0": {"type": "diffuse"}, "b1": {"type": "conductor"}})
    if b == "mask":
        bs.update({"opacity": 0.5, "bsdf": {"type": "diffuse"}})
    if b == "twosided":
        bs["bsdf"] = {"type": "diffuse"}
    if b == "bumpmap":
        bs.update({"texture": {"type": "checkerboard"}, "bsdf": {"type": "diffuse"}})
    if b == "normalmap":
        # raw image array (bitmap-texture shorthand)
        bs.update({"normalmap": np.ones((4, 4, 3), np.float32) * 0.5,
                   "bsdf": {"type": "diffuse"}})
    d["obj"]["bsdf"] = bs
    mi.load_dict(d)


@pytest.mark.parametrize("sh", "rectangle disk cube cylinder sphere".split())
def test_shapes_analytic(sh):
    d = base()
    d["obj"] = {"type": sh, "bsdf": {"type": "diffuse"}}
    mi.load_dict(d)


@pytest.mark.parametrize("v", ["constvolume", "gridvolume"])
def test_volumes(v):
    d = base()
    vol = {"type": "constvolume", "value": 1.0} if v == "constvolume" else \
        {"type": "gridvolume", "data": np.ones((2, 2, 2, 1), np.float32)}
    d["obj"]["interior"] = {"type": "heterogeneous", "sigma_t": vol, "albedo": 0.5, "scale": 1.0}
    d["obj"]["bsdf"] = {"type": "null"}
    d["integrator"] = {"type": "volpath", "max_depth": 2}
    mi.load_dict(d)
