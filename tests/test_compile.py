"""Compile-count regression (analog of the reference's kernel-launch /
megakernel tests, src/render/tests/test_renders.py spirit): a render must
trace+compile ONCE per (scene structure, resolution, spp_pass) and reuse the
executable across seeds, passes and parameter-value updates.  Retracing is
the XLA equivalent of the reference recompiling its megakernel every frame —
a silent 100x slowdown."""
import jax
import numpy as np
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render_api import _render_pass_dyn as _render_pass


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def _small_cbox():
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    return mi.load_dict(d)


def test_no_retrace_across_seeds_and_passes():
    scene = _small_cbox()
    base = _render_pass._cache_size()
    mi.render(scene, spp=4, seed=0)
    after_first = _render_pass._cache_size()
    assert after_first == base + 1, "first render should compile exactly once"
    # different seed, multiple passes with the same spp_pass: zero new traces
    mi.render(scene, spp=8, seed=1, spp_per_pass=4)
    assert _render_pass._cache_size() == after_first, (
        "re-render with a new seed/pass-split must reuse the compiled pass"
    )


def test_no_retrace_on_parameter_update():
    scene = _small_cbox()
    mi.render(scene, spp=4, seed=0)
    n = _render_pass._cache_size()
    params = mi.traverse(scene)
    key = next(k for k in params.keys() if "reflectance" in k)
    params[key] = params[key] * 0.5
    scene2 = params.update()
    img = np.asarray(mi.render(scene2, spp=4, seed=0))
    assert _render_pass._cache_size() == n, (
        "a value-only parameter update must not retrace the render pass"
    )
    assert np.isfinite(img).all()


def test_retrace_only_on_structure_change():
    scene = _small_cbox()
    mi.render(scene, spp=4, seed=0)
    n = _render_pass._cache_size()
    # a different spp_pass is a new static configuration: exactly one new trace
    mi.render(scene, spp=2, seed=0)
    assert _render_pass._cache_size() == n + 1
