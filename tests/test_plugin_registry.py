"""User-plugin registration API (reference: mi.register_bsdf & the
MI_PY_REGISTER_OBJECT family, src/render/python/bsdf_v.cpp:214,
src/render/tests/test_bsdf.py:57, src/python/python/ad/integrators/prb.py:259).

Covers: first-class object plugins for duck-typed categories (bsdf, phase,
integrator), dict-expansion plugins for structural categories (shape, emitter,
texture, sampler), traverse_paths() parameter exposure, shadowing/unregister
semantics."""
import numpy as np
import jax.numpy as jnp
import pytest
from flax import struct

import mitsuba_tpu as mi
from mitsuba_tpu.core import warp
from mitsuba_tpu.core.math import INV_PI
from mitsuba_tpu.render.records import BSDFSample
from mitsuba_tpu.render.textures import tex_eval


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


@struct.dataclass
class TintedDiffuse:
    """Lambertian with a global tint — the DummyBSDF analog
    (reference: src/render/tests/test_bsdf.py:26-57)."""

    reflectance: object
    tint: jnp.ndarray

    flags_smooth = True
    flags_transmission = False

    def _albedo(self, si, wavelengths, n_channels):
        refl = tex_eval(self.reflectance, si, wavelengths, n_channels)
        return refl * self.tint[None, :n_channels]

    def eval(self, si, wo, wavelengths, n_channels):
        cos_o = wo[..., 2]
        valid = (si.wi[..., 2] > 0) & (cos_o > 0)
        val = self._albedo(si, wavelengths, n_channels) * (
            INV_PI * jnp.maximum(cos_o, 0.0)
        )[..., None]
        return jnp.where(valid[..., None], val, 0.0)

    def pdf(self, si, wo):
        valid = (si.wi[..., 2] > 0) & (wo[..., 2] > 0)
        return jnp.where(valid, warp.square_to_cosine_hemisphere_pdf(wo), 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        wo = warp.square_to_cosine_hemisphere(u2)
        pdf = warp.square_to_cosine_hemisphere_pdf(wo)
        valid = si.wi[..., 2] > 0
        weight = jnp.where(
            valid[..., None], self._albedo(si, wavelengths, n_channels), 0.0
        )
        bs = BSDFSample(
            wo=wo,
            pdf=jnp.where(valid, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            delta=jnp.zeros_like(valid),
        )
        return bs, weight

    def traverse_paths(self):
        return [("tint", ("tint",))]


def _tinted_ctor(props):
    from mitsuba_tpu.render.scene_loader import parse_texture

    tex, _ = parse_texture(props.get("reflectance", 0.5))
    tint = jnp.asarray(props.get("tint", [1.0, 1.0, 1.0]), jnp.float32)
    return TintedDiffuse(reflectance=tex, tint=tint)


def _furnace_scene(bsdf_spec, spp=64):
    return mi.load_dict(
        {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 2, "rr_depth": 64},
            "sensor": {
                "type": "perspective",
                "fov": 10,
                "to_world": [
                    {"type": "look_at", "origin": [0, 0, 4],
                     "target": [0, 0, 0], "up": [0, 1, 0]}
                ],
                "film": {"type": "hdrfilm", "width": 16, "height": 16,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": spp},
            },
            "sph": {"type": "sphere", "radius": 1.0, "bsdf": bsdf_spec},
            "env": {"type": "constant", "radiance": 1.0},
        }
    )


def test_register_bsdf_object():
    """Custom BSDF renders; tint=1 matches builtin diffuse exactly (same
    sampling decisions -> same estimator)."""
    mi.register_bsdf("tinted", _tinted_ctor)
    try:
        ref = np.asarray(
            mi.render(_furnace_scene({"type": "diffuse", "reflectance": 0.5}), spp=64)
        )
        img = np.asarray(
            mi.render(
                _furnace_scene({"type": "tinted", "reflectance": 0.5,
                                "tint": [1.0, 1.0, 1.0]}),
                spp=64,
            )
        )
        np.testing.assert_allclose(img, ref, atol=1e-5)

        tinted = np.asarray(
            mi.render(
                _furnace_scene({"type": "tinted", "reflectance": 0.5,
                                "tint": [1.0, 0.5, 0.25]}),
                spp=64,
            )
        )
        # center pixel = albedo under max_depth=2 furnace
        c = tinted[8, 8]
        np.testing.assert_allclose(c, [0.5, 0.25, 0.125], atol=0.05)
    finally:
        mi.unregister_plugin("bsdf", "tinted")


def test_register_bsdf_traverse_paths():
    """traverse_paths() leaves appear in SceneParameters and are live."""
    mi.register_bsdf("tinted", _tinted_ctor)
    try:
        scene = _furnace_scene(
            {"type": "tinted", "reflectance": 1.0, "tint": [1.0, 1.0, 1.0]}, spp=16
        )
        params = mi.traverse(scene)
        key = "sph.bsdf.tint"
        assert key in params.keys()
        params[key] = jnp.asarray([0.25, 0.25, 0.25], jnp.float32)
        scene2 = params.update()
        img = np.asarray(mi.render(scene2, spp=64))
        np.testing.assert_allclose(img[8, 8], 0.25, atol=0.05)
    finally:
        mi.unregister_plugin("bsdf", "tinted")


def test_register_bsdf_dict_expansion():
    """A bsdf constructor may expand to a builtin spec dict."""
    mi.register_bsdf(
        "halfgray", lambda props: {"type": "diffuse", "reflectance": 0.5}
    )
    try:
        img = np.asarray(mi.render(_furnace_scene({"type": "halfgray"}), spp=64))
        np.testing.assert_allclose(img[8, 8], 0.5, atol=0.05)
    finally:
        mi.unregister_plugin("bsdf", "halfgray")


def test_register_shape_emitter_texture_sampler_expansion():
    """Structural categories expand to builtin specs inside a full scene."""
    mi.register_shape(
        "unitquad",
        lambda props: {"type": "rectangle",
                       **{k: v for k, v in props.items() if k != "type"}},
    )
    mi.register_emitter(
        "sky", lambda props: {"type": "constant",
                              "radiance": props.get("brightness", 1.0)}
    )
    mi.register_texture(
        "gray", lambda props: {"type": "uniform", "value": props.get("level", 0.5)}
    )
    mi.register_sampler(
        "independent2x",
        lambda props: {"type": "independent",
                       "sample_count": 2 * int(props.get("sample_count", 8))},
    )
    try:
        scene = mi.load_dict(
            {
                "type": "scene",
                "integrator": {"type": "path", "max_depth": 2},
                "sensor": {
                    "type": "perspective",
                    "fov": 45,
                    "to_world": [
                        {"type": "look_at", "origin": [0, 0, 3],
                         "target": [0, 0, 0], "up": [0, 1, 0]}
                    ],
                    "film": {"type": "hdrfilm", "width": 16, "height": 16,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent2x", "sample_count": 8},
                },
                "quad": {"type": "unitquad",
                         "bsdf": {"type": "diffuse",
                                  "reflectance": {"type": "gray", "level": 0.75}}},
                "light": {"type": "sky", "brightness": 1.0},
            }
        )
        assert scene.spp == 16  # sampler expansion doubled it
        img = np.asarray(mi.render(scene, spp=32))
        assert np.isfinite(img).all()
        # head-on unit-radiance furnace wall: ~0.75 reflectance * cos-weighted
        assert img.mean() > 0.1
    finally:
        mi.unregister_plugin("shape", "unitquad")
        mi.unregister_plugin("emitter", "sky")
        mi.unregister_plugin("texture", "gray")
        mi.unregister_plugin("sampler", "independent2x")


def test_register_integrator():
    """Integrator registration: both dict-expansion and object return."""
    mi.register_integrator(
        "mydirect", lambda props: {"type": "path",
                                   "max_depth": int(props.get("bounces", 2))}
    )
    try:
        scene = _furnace_scene({"type": "diffuse", "reflectance": 0.5})
        from mitsuba_tpu.integrators import make_integrator

        integ = make_integrator({"type": "mydirect", "bounces": 2})
        assert integ.max_depth == 2
        # object return: hand back a builtin instance directly
        from mitsuba_tpu.integrators.path import PathIntegrator

        mi.register_integrator(
            "fixed3", lambda props: PathIntegrator(max_depth=3, rr_depth=8,
                                                   hide_emitters=False)
        )
        integ3 = make_integrator({"type": "fixed3"})
        assert integ3.max_depth == 3
    finally:
        mi.unregister_plugin("integrator", "mydirect")
        mi.unregister_plugin("integrator", "fixed3")


def test_register_phase_object():
    """Custom phase function object drives a homogeneous medium."""
    from mitsuba_tpu.render.phase import IsotropicPhase

    mi.register_phasefunction("myiso", lambda props: IsotropicPhase())
    try:
        scene = mi.load_dict(
            {
                "type": "scene",
                "integrator": {"type": "volpath", "max_depth": 8},
                "sensor": {
                    "type": "perspective",
                    "fov": 45,
                    "to_world": [
                        {"type": "look_at", "origin": [0, 0, 4],
                         "target": [0, 0, 0], "up": [0, 1, 0]}
                    ],
                    "film": {"type": "hdrfilm", "width": 8, "height": 8,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent", "sample_count": 16},
                },
                "box": {
                    "type": "cube",
                    "bsdf": {"type": "null"},
                    "interior": {
                        "type": "homogeneous",
                        "sigma_t": 0.8,
                        "albedo": 0.9,
                        "phase": {"type": "myiso"},
                    },
                },
                "env": {"type": "constant", "radiance": 1.0},
            }
        )
        img = np.asarray(mi.render(scene, spp=32))
        assert np.isfinite(img).all()
        assert img.mean() > 0.2
    finally:
        mi.unregister_plugin("phase", "myiso")


def test_register_texture_object():
    """First-class texture object plugin with a custom eval."""

    @struct.dataclass
    class HalfTex:
        value: jnp.ndarray

        def eval(self, uv, wavelengths, n_channels):
            n = uv.shape[0]
            return jnp.broadcast_to(self.value[:n_channels], (n, n_channels))

    mi.register_texture(
        "half", lambda props: HalfTex(value=jnp.asarray([0.5, 0.5, 0.5]))
    )
    try:
        img = np.asarray(
            mi.render(
                _furnace_scene(
                    {"type": "diffuse", "reflectance": {"type": "half"}}
                ),
                spp=64,
            )
        )
        np.testing.assert_allclose(img[8, 8], 0.5, atol=0.05)
    finally:
        mi.unregister_plugin("texture", "half")


def test_register_medium_expansion_rolls_back_phase_paths():
    """A medium dict-expansion must not leave stale param paths from the
    speculative phase parse (regression: '<name>.phase_function.g' pointed
    at a phase slot the expansion replaced)."""
    mi.register_medium(
        "fog",
        lambda props: {"type": "homogeneous", "sigma_t": 0.5, "albedo": 0.9,
                       "phase": {"type": "isotropic"}},
    )
    try:
        scene = mi.load_dict({
            "type": "scene",
            "integrator": {"type": "volpath", "max_depth": 4},
            "sensor": {
                "type": "perspective",
                "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                              "target": [0, 0, 0], "up": [0, 1, 0]}],
                "film": {"type": "hdrfilm", "width": 8, "height": 8,
                         "rfilter": {"type": "box"}},
            },
            "box": {
                "type": "cube",
                "bsdf": {"type": "null"},
                "interior": {"type": "fog", "hgish": {"type": "hg", "g": 0.7}},
            },
            "env": {"type": "constant", "radiance": 1.0},
        })
        params = mi.traverse(scene)
        # the speculative hg path must be gone; every surviving key resolves
        for k in params.keys():
            params[k]  # no AttributeError
        assert not any("phase_function.g" in k for k in params.keys())
        img = np.asarray(mi.render(scene, spp=16))
        assert np.isfinite(img).all()
    finally:
        mi.unregister_plugin("medium", "fog")


def test_static_builtin_shadowing_rejected():
    """rfilter/sampler/film/texture/volume builtins cannot be shadowed
    (regression: register_rfilter('gaussian', ...) silently rerouted every
    scene's default filter)."""
    for cat, name in [("rfilter", "gaussian"), ("sampler", "independent"),
                      ("film", "hdrfilm"), ("texture", "checkerboard"),
                      ("volume", "gridvolume")]:
        with pytest.raises(ValueError, match="shadow"):
            mi.register_plugin(cat, name, lambda props: {"type": "box"})


def test_shadowing_and_errors():
    with pytest.raises(ValueError):
        mi.register_bsdf("diffuse", lambda props: None)  # builtin shadow
    with pytest.raises(ValueError):
        mi.register_plugin("nonsense-category", "x", lambda props: None)
    with pytest.raises(TypeError):
        mi.register_bsdf("notcallable", 42)
    # unknown stays unknown after unregister
    mi.register_bsdf("ephemeral", lambda props: {"type": "diffuse"})
    mi.unregister_plugin("bsdf", "ephemeral")
    with pytest.raises(ValueError, match="unknown bsdf"):
        mi.load_dict(
            {
                "type": "scene",
                "s": {"type": "sphere", "bsdf": {"type": "ephemeral"}},
            }
        )


def test_expansion_cycle_guard():
    mi.register_bsdf("loopy", lambda props: {"type": "loopy"})
    try:
        with pytest.raises(RecursionError):
            _furnace_scene({"type": "loopy"})
    finally:
        mi.unregister_plugin("bsdf", "loopy")


def test_structural_object_return_rejected():
    """Structural categories must expand to dicts, not return objects."""
    mi.register_shape("badshape", lambda props: object())
    try:
        with pytest.raises(TypeError, match="spec dict"):
            mi.load_dict({"type": "scene", "s": {"type": "badshape"}})
    finally:
        mi.unregister_plugin("shape", "badshape")
