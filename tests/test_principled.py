"""Principled BSDF family + true smooth plastic
(reference: src/bsdfs/tests/test_principled.py, test_plastic.py —
chi2 sample/pdf consistency + energy sanity + loader round trips)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.chi2 import BSDFAdapter, ChiSquareTest
from mitsuba_tpu.render.bsdf_principled import (
    PrincipledBSDF,
    PrincipledThinBSDF,
    SmoothPlasticBSDF,
)
from mitsuba_tpu.render.records import SurfaceInteraction
from mitsuba_tpu.render.textures import ConstantTexture

N = 300_000
WI = [0.3, -0.25, np.sqrt(1 - 0.09 - 0.0625)]
WI_BACK = [0.3, -0.25, -np.sqrt(1 - 0.09 - 0.0625)]


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _tex(v):
    return ConstantTexture(value=jnp.asarray(np.atleast_1d(v), jnp.float32))


def _principled(**kw):
    texkeys = dict(
        base_color=0.5, roughness=0.5, anisotropic=0.0, metallic=0.0,
        spec_trans=0.0, spec_tint=0.0, sheen=0.0, sheen_tint=0.0,
        flatness=0.0, clearcoat=0.0, clearcoat_gloss=0.0,
    )
    texkeys.update({k: v for k, v in kw.items() if k in texkeys})
    has = {f"has_{k}": bool(np.any(np.asarray(kw.get(k, 0.0)) != 0.0))
           for k in ("anisotropic", "metallic", "spec_trans", "spec_tint",
                     "sheen", "sheen_tint", "flatness", "clearcoat")}
    return PrincipledBSDF(
        eta=jnp.asarray(kw.get("eta", 1.5), jnp.float32),
        **{k: _tex(v) for k, v in texkeys.items()},
        **has,
    )


def _thin(**kw):
    texkeys = dict(
        base_color=0.5, roughness=0.5, anisotropic=0.0, spec_trans=0.0,
        spec_tint=0.0, sheen=0.0, sheen_tint=0.0, flatness=0.0, diff_trans=0.0,
    )
    texkeys.update({k: v for k, v in kw.items() if k in texkeys})
    has = {f"has_{k}": bool(np.any(np.asarray(kw.get(k, 0.0)) != 0.0))
           for k in ("anisotropic", "spec_trans", "spec_tint", "sheen",
                     "sheen_tint", "flatness", "diff_trans")}
    return PrincipledThinBSDF(
        eta_thin=_tex(kw.get("eta", 1.5)),
        **{k: _tex(v) for k, v in texkeys.items()},
        **has,
    )


def _chi2(bsdf, wi, seed=7):
    s, p = BSDFAdapter(bsdf, wi)
    t = ChiSquareTest(s, p, sample_count=N, seed=seed)
    assert t.run(), t.messages


# ---------------------------------------------------------------------------
# chi2: sample() distribution matches pdf() (principled.cpp:333-492 vs 712-838)
# ---------------------------------------------------------------------------

def test_chi2_principled_diffuse_rough():
    _chi2(_principled(roughness=0.6), WI)


def test_chi2_principled_metallic_aniso():
    _chi2(_principled(metallic=0.7, roughness=0.35, anisotropic=0.6), WI)


def test_chi2_principled_clearcoat_sheen():
    _chi2(
        _principled(clearcoat=0.8, clearcoat_gloss=0.4, sheen=0.5,
                    sheen_tint=0.3, roughness=0.4, metallic=0.2), WI,
    )


def test_chi2_principled_spec_trans_front():
    _chi2(_principled(spec_trans=0.7, roughness=0.45, eta=1.5), WI)


def test_chi2_principled_spec_trans_back():
    # inside the object: only reflect/refract lobes (principled.cpp:376-383)
    _chi2(_principled(spec_trans=0.9, roughness=0.5, eta=1.5), WI_BACK)


def test_chi2_principled_thin_full():
    _chi2(_thin(spec_trans=0.6, diff_trans=1.0, roughness=0.5, eta=1.4), WI)


# ---------------------------------------------------------------------------
# analytic / energy sanity
# ---------------------------------------------------------------------------

def _hemisphere_integral(bsdf, wi, n=400_000, seed=1):
    """Integrate eval (= f cos) over all sphere directions via uniform MC."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    si = SurfaceInteraction.invalid(n).replace(
        wi=jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
    )
    vals = np.asarray(bsdf.eval(si, jnp.asarray(d), None, 1))
    return vals.mean(0) * 4.0 * np.pi


def test_principled_energy_conservation():
    b = _principled(base_color=1.0, roughness=0.4, metallic=0.3,
                    clearcoat=1.0, clearcoat_gloss=0.5, sheen=0.6)
    e = _hemisphere_integral(b, WI)
    assert 0.1 < float(e[0]) <= 1.1, e


def test_principled_white_lambert_limit():
    """roughness->0(ish), no specular extras: diffuse+retro ~ base_color."""
    b = _principled(base_color=0.6, roughness=0.05)
    e = _hemisphere_integral(b, [0.0, 0.0, 1.0])
    # diffuse lobe alone integrates to ~base*(1-F corrections) — loose band
    assert 0.3 < float(e[0]) < 0.7, e


def test_plastic_energy_and_interreflection():
    """Diffuse term with 1/(1-rho Fdr) series must stay below 1 and exceed
    the naive (1-Fi)(1-Fo)/eta^2 product (plastic.cpp:276-306)."""
    b = SmoothPlasticBSDF(
        eta=jnp.asarray(1.5, jnp.float32),
        diffuse_reflectance=_tex(0.9), specular_reflectance=_tex(1.0),
    )
    e = _hemisphere_integral(b, [0.0, 0.0, 1.0])
    assert 0.5 < float(e[0]) < 1.0, e
    naive = SmoothPlasticBSDF(
        eta=jnp.asarray(1.5, jnp.float32),
        diffuse_reflectance=_tex(0.9), specular_reflectance=_tex(1.0),
        nonlinear=True,
    )
    e2 = _hemisphere_integral(naive, [0.0, 0.0, 1.0])
    # nonlinear=True uses 1 - rho*Fdr (plastic.cpp:291): for rho < 1 the
    # series denominator is larger, so the diffuse term is dimmer
    assert 0.0 < float(e2[0]) < float(e[0])


def test_plastic_sample_weight_consistency():
    """Diffuse-lobe sampled weight must equal eval/pdf."""
    n = 4096
    rng = np.random.default_rng(3)
    b = SmoothPlasticBSDF(
        eta=jnp.asarray(1.5, jnp.float32),
        diffuse_reflectance=_tex(0.5), specular_reflectance=_tex(1.0),
    )
    si = SurfaceInteraction.invalid(n).replace(
        wi=jnp.broadcast_to(jnp.asarray(WI, jnp.float32), (n, 3))
    )
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    bs, w = b.sample(u1, u2, si, None, 1)
    val = b.eval(si, bs.wo, None, 1)
    pdf = b.pdf(si, bs.wo)
    diffuse = ~np.asarray(bs.delta)
    ratio = np.asarray(val)[diffuse, 0] / np.maximum(np.asarray(pdf)[diffuse], 1e-12)
    np.testing.assert_allclose(np.asarray(w)[diffuse, 0], ratio, rtol=1e-4)


# ---------------------------------------------------------------------------
# loader + render smoke
# ---------------------------------------------------------------------------

def _sphere_scene(bsdf):
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {
            "type": "perspective", "fov": 40,
            "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 24, "height": 24,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 32},
        },
        "obj": {"type": "sphere", "bsdf": bsdf},
        "env": {"type": "constant", "radiance": 1.0},
    }


def test_loader_principled_render():
    d = _sphere_scene({
        "type": "principled", "base_color": {"type": "rgb", "value": [0.8, 0.4, 0.2]},
        "metallic": 0.5, "roughness": 0.3, "clearcoat": 0.5, "sheen": 0.3,
        "spec_trans": 0.4, "specular": 0.6,
    })
    img = np.asarray(mi.render(mi.load_dict(d), spp=32, seed=1))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_loader_principled_thin_render():
    d = _sphere_scene({
        "type": "principled_thin", "base_color": {"type": "rgb", "value": [0.6, 0.6, 0.9]},
        "roughness": 0.4, "spec_trans": 0.5, "diff_trans": 0.8, "eta": 1.4,
    })
    img = np.asarray(mi.render(mi.load_dict(d), spp=32, seed=1))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_loader_plastic_vs_roughplastic():
    """True plastic should render brighter than the old alpha=0.01
    roughplastic stand-in never darker than half, and both finite."""
    d1 = _sphere_scene({"type": "plastic",
                        "diffuse_reflectance": {"type": "rgb", "value": [0.7, 0.7, 0.7]}})
    d2 = _sphere_scene({"type": "roughplastic", "alpha": 0.05,
                        "diffuse_reflectance": {"type": "rgb", "value": [0.7, 0.7, 0.7]}})
    a = np.asarray(mi.render(mi.load_dict(d1), spp=48, seed=2))
    c = np.asarray(mi.render(mi.load_dict(d2), spp=48, seed=2))
    assert np.isfinite(a).all() and np.isfinite(c).all()
    assert abs(a.mean() - c.mean()) / max(c.mean(), 1e-6) < 0.35, (a.mean(), c.mean())
