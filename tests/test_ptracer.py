"""Adjoint particle tracer vs forward path tracer (the classic light-tracing
consistency check; reference: test coverage of ptracer via test_renders.py)."""
import numpy as np
import pytest

import mitsuba_tpu as mi


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("rgb")
    yield


def test_ptracer_matches_path():
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 24
    d["sensor"]["film"]["height"] = 24
    d["integrator"] = {"type": "path", "max_depth": 4}
    ref = np.asarray(mi.render(mi.load_dict(d), spp=384, seed=1))
    d["integrator"] = {"type": "ptracer", "max_depth": 4}
    img = np.asarray(mi.render(mi.load_dict(d), spp=384, seed=2))
    assert np.isfinite(img).all()
    # skip the top rows containing the light fixture (delta-to-camera paths
    # of the emitter itself have higher variance under light tracing)
    a, b = ref[6:], img[6:]
    rel_mean = abs(a.mean() - b.mean()) / a.mean()
    assert rel_mean < 0.05, (a.mean(), b.mean())
    rel_pix = np.abs(a - b).mean() / a.mean()
    assert rel_pix < 0.25, rel_pix
