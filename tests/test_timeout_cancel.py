"""render(timeout=..., cancel=...) stop the multipass loop at a pass
boundary and return the unbiased partial accumulation (reference: the
integrator `timeout` property and Integrator::cancel()/m_stop,
src/render/integrator.cpp:24,120-122,248)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi


def _first_pass(scene, spp_pass, spp_total, seed=0):
    """The image a render stopped after pass 0 must return: pass 0's lanes
    (RNG keyed by the FULL spp_total), developed and normalized by the
    samples actually rendered."""
    from mitsuba_tpu.render_api import _render_pass
    from mitsuba_tpu.render.film import develop

    L, _, _, aux = _render_pass(
        scene, jnp.uint32(seed), 0, spp_pass, spp_total, 0
    )
    return np.asarray(
        develop(scene.film, L, spp_pass, jitter=aux.get("film_jitter"))
    )


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _scene():
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    d["integrator"] = {"type": "path", "max_depth": 3}
    return mi.load_dict(d)


def test_cancel_returns_partial_unbiased():
    scene = _scene()
    tok = mi.CancelToken()
    tok.cancel()
    # cancelled before pass 1: only pass 0 runs -> exactly the first
    # spp_per_pass samples, normalized by what was actually rendered
    img_partial = np.asarray(
        mi.render(scene, spp=32, spp_per_pass=8, seed=0, cancel=tok)
    )
    np.testing.assert_allclose(img_partial, _first_pass(scene, 8, 32), rtol=1e-5)

    # un-cancelled token changes nothing
    img_full = np.asarray(mi.render(scene, spp=32, spp_per_pass=8, seed=0))
    img_tok = np.asarray(
        mi.render(scene, spp=32, spp_per_pass=8, seed=0, cancel=mi.CancelToken())
    )
    np.testing.assert_allclose(img_tok, img_full, rtol=1e-6)


def test_timeout_zero_stops_after_first_pass():
    scene = _scene()
    img = np.asarray(mi.render(scene, spp=32, spp_per_pass=8, seed=0, timeout=0.0))
    np.testing.assert_allclose(img, _first_pass(scene, 8, 32), rtol=1e-5)


def test_timeout_splits_passes_by_default():
    # with timeout set and no spp_per_pass, spp auto-splits (~8 passes) so
    # checkpoints exist; a generous timeout still renders everything
    scene = _scene()
    img = np.asarray(mi.render(scene, spp=32, seed=0, timeout=3600.0))
    ref = np.asarray(mi.render(scene, spp=32, spp_per_pass=4, seed=0))
    np.testing.assert_allclose(img, ref, rtol=1e-5)
