"""Path regeneration — wavefront compaction without dynamic shapes
(SURVEY §5 long-context analog (a); Novak et al. 2010 path regeneration).

RNG streams are keyed by (pixel, sample) identically to the plain wavefront,
so the regenerative render must match the standard render almost exactly
(same per-sample contributions, different accumulation order)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi


def _scene(max_depth=8, regenerate=False, w=32, h=32):
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = h
    d["integrator"] = {
        "type": "path", "max_depth": max_depth, "regenerate": regenerate,
        # isolate the schedule comparison from the NEE batching optimisation
        "defer_nee": False,
    }
    return mi.load_dict(d)


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def test_regen_matches_standard_render():
    """Same seed => same per-sample contributions => images agree to float
    accumulation-order tolerance."""
    spp = 8
    img_std = np.asarray(mi.render(_scene(max_depth=6), spp=spp, seed=2))
    img_reg = np.asarray(
        mi.render(_scene(max_depth=6, regenerate=True), spp=spp, seed=2)
    )
    np.testing.assert_allclose(img_reg, img_std, rtol=2e-4, atol=2e-5)


def test_regen_fewer_wavefront_iterations():
    """Deep transport budget: regeneration must finish in far fewer wavefront
    iterations than the spp * max_depth the masked wavefront always runs."""
    from mitsuba_tpu.render_api import _render_regen_pass

    spp, max_depth = 16, 32
    scene = _scene(max_depth=max_depth, regenerate=True)
    _, aux = _render_regen_pass(scene, jnp.uint32(0), spp, 0)
    iters = int(aux["wavefront_iters"])
    standard_iters = spp * max_depth
    # cbox paths average ~4-6 bounces -> expect >3x fewer iterations
    assert iters < standard_iters / 3, (iters, standard_iters)
    assert iters >= spp  # sanity: at least one iteration per sample


def test_regen_unbiased_vs_high_spp():
    """Regenerative estimate converges to the standard estimate."""
    img_std = np.asarray(mi.render(_scene(max_depth=4), spp=64, seed=5))
    img_reg = np.asarray(
        mi.render(_scene(max_depth=4, regenerate=True), spp=64, seed=5)
    )
    assert abs(img_reg.mean() - img_std.mean()) < 1e-4


def test_regen_spp1_and_odd_spp():
    for spp in (1, 3):
        img_std = np.asarray(mi.render(_scene(max_depth=3), spp=spp, seed=7))
        img_reg = np.asarray(
            mi.render(_scene(max_depth=3, regenerate=True), spp=spp, seed=7)
        )
        np.testing.assert_allclose(img_reg, img_std, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# differentiable regeneration (PRB replay over the compacted wavefront)
# ---------------------------------------------------------------------------

def _prb_scene(regenerate, max_depth=4):
    import jax.numpy as jnp

    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 24
    d["sensor"]["film"]["height"] = 24
    d["integrator"] = {
        "type": "prb", "max_depth": max_depth,
        "regenerate": regenerate, "defer_nee": False,
    }
    return mi.load_dict(d)


def test_prb_regen_grads_match_standard():
    """Per-sample contributions and replays are identical, so regen PRB
    gradients must match standard PRB gradients to float tolerance."""
    import jax
    import jax.numpy as jnp
    from mitsuba_tpu.render.params import _tree_get, _tree_set

    spp, seed = 8, 4
    key = "white.reflectance.value"

    def grad_for(regen):
        scene = _prb_scene(regen)
        path = dict(scene.param_paths)[key]
        base = _tree_get(scene, path)

        def loss(v):
            img = mi.render(_tree_set(scene, path, v), spp=spp, seed=seed)
            return img.mean()

        return np.asarray(jax.grad(loss)(base))

    g_std = grad_for(False)
    g_reg = grad_for(True)
    np.testing.assert_allclose(g_reg, g_std, rtol=5e-4, atol=1e-7)
    assert np.abs(g_std).max() > 0  # non-trivial gradient


def test_prb_regen_primal_matches():
    spp = 8
    img_std = np.asarray(mi.render(_prb_scene(False), spp=spp, seed=2))
    img_reg = np.asarray(mi.render(_prb_scene(True), spp=spp, seed=2))
    np.testing.assert_allclose(img_reg, img_std, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# volumetric regeneration (the deep-AOS-budget case VERDICT r1 named)
# ---------------------------------------------------------------------------

def _vol_scene(max_depth, regenerate, sigma=4.0, w=16, h=16):
    d = {
        "type": "scene",
        "integrator": {
            "type": "volpath", "max_depth": max_depth,
            "regenerate": regenerate, "track_steps": 16, "nee_steps": 16,
        },
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": w, "height": h},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        "light": {"type": "constant", "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
        "slab": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [1.2, 1.2, 1.2]}],
            "bsdf": {"type": "null"},
            "interior": {
                "type": "homogeneous",
                "sigma_t": [sigma, sigma, sigma],
                "albedo": [0.95, 0.95, 0.95],
                "phase": {"type": "hg", "g": 0.6},
            },
        },
    }
    return mi.load_dict(d)


def test_volpath_regen_matches_standard():
    spp = 4
    img_std = np.asarray(mi.render(_vol_scene(12, False), spp=spp, seed=3))
    img_reg = np.asarray(mi.render(_vol_scene(12, True), spp=spp, seed=3))
    np.testing.assert_allclose(img_reg, img_std, rtol=3e-4, atol=3e-5)


def _aos_scene(regenerate):
    """Ocean-like: dielectric interface over a scattering medium (the
    refractive-NEE state `refr` must reset correctly on regeneration)."""
    d = {
        "type": "scene",
        "integrator": {"type": "volpathaos", "max_depth": 6, "regenerate": regenerate},
        "sensor": {
            "type": "perspective", "fov": 50,
            "to_world": [{"type": "look_at", "origin": [0, 0, 3],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 12, "height": 12,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        "light": {"type": "constant", "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
        "surface": {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": [4.0, 4.0, 1.0]}],
            "bsdf": {"type": "dielectric", "int_ior": 1.33, "ext_ior": 1.0},
            "interior": {
                "type": "homogeneous",
                "sigma_t": [0.8, 0.8, 0.8],
                "albedo": [0.9, 0.9, 0.9],
                "phase": {"type": "rayleigh"},
            },
        },
    }
    return mi.load_dict(d)


def test_volpathaos_regen_matches_standard():
    spp = 4
    img_std = np.asarray(mi.render(_aos_scene(False), spp=spp, seed=9))
    img_reg = np.asarray(mi.render(_aos_scene(True), spp=spp, seed=9))
    np.testing.assert_allclose(img_reg, img_std, rtol=3e-4, atol=3e-5)


def test_volpath_regen_spectral():
    """Spectral mode: hero wavelengths per sample, sRGB conversion at flush
    — the regenerative render must agree with the standard spectral render
    (same streams, same per-sample values; only accumulation order moves)."""
    mi.set_variant("spectral")
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    d["integrator"] = {"type": "volpath", "max_depth": 4}
    img_std = np.asarray(mi.render(mi.load_dict(d), spp=8, seed=6))
    d["integrator"]["regenerate"] = True
    img_reg = np.asarray(mi.render(mi.load_dict(d), spp=8, seed=6))
    mi.set_variant("rgb")
    np.testing.assert_allclose(img_reg, img_std, rtol=3e-4, atol=3e-5)


def test_volpath_regen_polarized():
    """Polarized mode: per-path sensor-frame Stokes rotation at flush."""
    mi.set_variant("mono_polarized")
    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 4},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 12, "height": 12,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 8},
        },
        "light": {"type": "constant", "radiance": 1.0},
        "slab": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [1.0, 1.0, 0.3]}],
            "bsdf": {"type": "null"},
            "interior": {
                "type": "homogeneous", "sigma_t": 1.0, "albedo": 0.9,
                "phase": {"type": "rayleigh"},
            },
        },
    }
    img_std = np.asarray(mi.render(mi.load_dict(d), spp=8, seed=8))
    d["integrator"]["regenerate"] = True
    img_reg = np.asarray(mi.render(mi.load_dict(d), spp=8, seed=8))
    mi.set_variant("rgb")
    assert img_std.shape == img_reg.shape  # [H, W, 4, C] Stokes layout
    np.testing.assert_allclose(img_reg, img_std, rtol=3e-4, atol=3e-5)
    # polarization actually present (Rayleigh slab side-scatter)
    assert np.abs(img_std[..., 1, :]).max() > 1e-4


def test_prbvolpath_regen_grads_match_standard():
    """Volumetric PRB over the compacted wavefront: identical per-sample
    replays, so regen gradients must match plain prbvolpath gradients."""
    import jax
    import jax.numpy as jnp
    from mitsuba_tpu.render.params import _tree_get, _tree_set

    spp, seed = 4, 11

    def grad_for(regen, key):
        d = {
            "type": "scene",
            "integrator": {
                "type": "prbvolpath", "max_depth": 6,
                "regenerate": regen, "track_steps": 16, "nee_steps": 16,
            },
            "sensor": {
                "type": "perspective", "fov": 45,
                "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                              "target": [0, 0, 0], "up": [0, 1, 0]}],
                "film": {"type": "hdrfilm", "width": 12, "height": 12,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": spp},
            },
            "light": {"type": "constant",
                      "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
            "slab": {
                "type": "cube",
                "to_world": [{"type": "scale", "value": [1.2, 1.2, 0.5]}],
                "bsdf": {"type": "null"},
                "interior": {
                    "type": "homogeneous",
                    "sigma_t": [2.0, 2.0, 2.0],
                    "albedo": [0.9, 0.9, 0.9],
                    "phase": {"type": "hg", "g": 0.4},
                },
            },
        }
        scene = mi.load_dict(d)
        path = [p for k, p in scene.param_paths if k == key][0]
        base = _tree_get(scene, path)

        def loss(v):
            img = mi.render(_tree_set(scene, path, v), spp=spp, seed=seed)
            return img.mean()

        return np.asarray(jax.grad(loss)(base))

    for key in ("slab.interior_medium.albedo.value.value",
                "slab.interior_medium.sigma_t.value.value"):
        g_std = grad_for(False, key)
        g_reg = grad_for(True, key)
        np.testing.assert_allclose(g_reg, g_std, rtol=1e-3, atol=1e-7)
        assert np.abs(g_std).max() > 0, key


def test_prb_volpathaos_regen_grads_match_standard():
    """AOS PRB over the compacted wavefront (refractive-NEE `refr` memory
    resets per restart): regen gradients must match plain prb_volpathaos."""
    import jax
    import jax.numpy as jnp
    from mitsuba_tpu.render.params import _tree_get, _tree_set

    spp, seed = 4, 13
    key = "surface.interior_medium.albedo.value.value"

    def grad_for(regen):
        d = {
            "type": "scene",
            "integrator": {"type": "prb_volpathaos", "max_depth": 6,
                           "regenerate": regen},
            "sensor": {
                "type": "perspective", "fov": 50,
                "to_world": [{"type": "look_at", "origin": [0, 0, 3],
                              "target": [0, 0, 0], "up": [0, 1, 0]}],
                "film": {"type": "hdrfilm", "width": 10, "height": 10,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": spp},
            },
            "light": {"type": "constant",
                      "radiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
            "surface": {
                "type": "rectangle",
                "to_world": [{"type": "scale", "value": [4.0, 4.0, 1.0]}],
                "bsdf": {"type": "dielectric", "int_ior": 1.33, "ext_ior": 1.0},
                "interior": {
                    "type": "homogeneous",
                    "sigma_t": [0.8, 0.8, 0.8],
                    "albedo": [0.9, 0.9, 0.9],
                    "phase": {"type": "rayleigh"},
                },
            },
        }
        scene = mi.load_dict(d)
        path = [p for k, p in scene.param_paths if k == key][0]
        base = _tree_get(scene, path)

        def loss(v):
            img = mi.render(_tree_set(scene, path, v), spp=spp, seed=seed)
            return img.mean()

        return np.asarray(jax.grad(loss)(base))

    g_std = grad_for(False)
    g_reg = grad_for(True)
    np.testing.assert_allclose(g_reg, g_std, rtol=1e-3, atol=1e-7)
    assert np.abs(g_std).max() > 0


def _vol_prb_scene(regen, spp):
    return {
        "type": "scene",
        "integrator": {"type": "prbvolpath", "max_depth": 5,
                       "regenerate": regen, "track_steps": 16, "nee_steps": 16},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": [{"type": "look_at", "origin": [0, 0, 4],
                          "target": [0, 0, 0], "up": [0, 1, 0]}],
            "film": {"type": "hdrfilm", "width": 10, "height": 10,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "light": {"type": "constant", "radiance": 1.0},
        "slab": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [1.2, 1.2, 0.5]}],
            "bsdf": {"type": "null"},
            "interior": {
                "type": "homogeneous",
                "sigma_t": 1.5,
                "albedo": 0.9,
                "phase": {"type": "rayleigh"},
            },
        },
    }


def _regen_vs_plain_grad(variant, key, spp=4, seed=17, rtol=1e-3):
    import jax
    from mitsuba_tpu.render.params import _tree_get, _tree_set

    def grad_for(regen):
        mi.set_variant(variant)
        scene = mi.load_dict(_vol_prb_scene(regen, spp))
        path = [p for k, p in scene.param_paths if k == key][0]
        base = _tree_get(scene, path)

        def loss(v):
            img = mi.render(_tree_set(scene, path, v), spp=spp, seed=seed)
            return img.mean()

        g = np.asarray(jax.grad(loss)(base))
        mi.set_variant("rgb")
        return g

    g_std = grad_for(False)
    g_reg = grad_for(True)
    np.testing.assert_allclose(g_reg, g_std, rtol=rtol, atol=1e-7)
    assert np.abs(g_std).max() > 0


def test_prbvolpath_regen_grads_spectral():
    """Spectral film domain: the regen backward pulls the per-pixel sRGB
    adjoint back through the XYZ conversion at each sample's recorded primal
    radiance and hero wavelengths."""
    _regen_vs_plain_grad("spectral", "slab.interior_medium.albedo.value.value")


def test_prb_polarized_regen_grads():
    """Polarized film domain: the regen backward rotates the per-pixel Stokes
    adjoint back into each fresh camera ray's frame (R^T, orthogonal)."""
    _regen_vs_plain_grad(
        "mono_polarized", "slab.interior_medium.albedo.value.value"
    )


def test_specfilm_regen_matches_standard_and_grads():
    """specfilm (SRF spectral channels) under regeneration: the flush-time
    SRF contraction must match the standard per-pass contraction, and the
    regen PRB backward must pull the per-channel adjoint back through it."""
    import jax
    from mitsuba_tpu.render.params import _tree_get, _tree_set

    spp, seed = 4, 19

    def scene_for(regen, prb):
        mi.set_variant("spectral")
        d = _vol_prb_scene(regen, spp)
        if not prb:
            d["integrator"]["type"] = "volpath"
        d["sensor"]["film"] = {
            "type": "specfilm", "width": 10, "height": 10,
            "rfilter": {"type": "box"},
            "band_green": {"type": "regular", "lambda_min": 500.0,
                           "lambda_max": 600.0, "values": [0.2, 1.0, 0.2]},
            "band_flat": {"type": "uniform", "value": 1.0},
        }
        return mi.load_dict(d)

    # primal match
    img_std = np.asarray(mi.render(scene_for(False, False), spp=spp, seed=seed))
    img_reg = np.asarray(mi.render(scene_for(True, False), spp=spp, seed=seed))
    mi.set_variant("rgb")
    assert img_std.shape == (10, 10, 2)
    np.testing.assert_allclose(img_reg, img_std, rtol=3e-4, atol=3e-5)

    # gradient match
    key = "slab.interior_medium.albedo.value.value"

    def grad_for(regen):
        scene = scene_for(regen, True)
        path = [p for k, p in scene.param_paths if k == key][0]
        base = _tree_get(scene, path)
        g = np.asarray(jax.grad(
            lambda v: mi.render(_tree_set(scene, path, v), spp=spp, seed=seed).mean()
        )(base))
        mi.set_variant("rgb")
        return g

    g_std = grad_for(False)
    g_reg = grad_for(True)
    np.testing.assert_allclose(g_reg, g_std, rtol=1e-3, atol=1e-7)
    assert np.abs(g_std).max() > 0


def test_volpath_regen_deep_budget_efficiency():
    """Optically thick slab at max_depth=32: the standard wavefront always
    executes spp * max_segments outer iterations; regeneration must need far
    fewer."""
    from mitsuba_tpu.render_api import _render_regen_pass
    import jax.numpy as jnp

    spp, max_depth = 8, 32
    scene = _vol_scene(max_depth, True)
    _, aux = _render_regen_pass(scene, jnp.uint32(1), spp, 0)
    iters = int(aux["wavefront_iters"])
    standard_iters = spp * (max_depth + 8)   # scan length in sample()
    assert iters < standard_iters / 2, (iters, standard_iters)
