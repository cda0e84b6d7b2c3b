"""prb_basic is the pure BSDF-sampling estimator — no NEE, no MIS
(reference: src/python/python/ad/integrators/prb_basic.py).  These tests
prove it is a genuinely different estimator from prb: same mean (both
unbiased), strictly higher variance (no next-event estimation), and a
working replay backward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.render.params import _tree_get, _tree_set


@pytest.fixture(autouse=True)
def _rgb():
    mi.set_variant("llvm_ad_rgb")
    yield


def _cbox(integrator, w=16, h=16):
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = h
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    d["integrator"] = integrator
    return mi.load_dict(d)


def test_prb_basic_is_not_an_alias():
    s = _cbox({"type": "prb_basic", "max_depth": 4})
    assert getattr(s.integrator, "is_prb", False)
    assert s.integrator.use_nee is False
    s2 = _cbox({"type": "prb", "max_depth": 4})
    assert s2.integrator.use_nee is True


def test_prb_basic_same_mean_higher_variance():
    """Unbiasedness: image means agree.  Simplicity: per-pixel variance over
    independent seeds is strictly higher without NEE (VERDICT r4 item 8)."""
    s_basic = _cbox({"type": "prb_basic", "max_depth": 4})
    s_prb = _cbox({"type": "prb", "max_depth": 4})

    imgs_b, imgs_p = [], []
    for seed in range(6):
        imgs_b.append(np.asarray(mi.render(s_basic, spp=32, seed=seed)))
        imgs_p.append(np.asarray(mi.render(s_prb, spp=32, seed=seed)))
    imgs_b, imgs_p = np.stack(imgs_b), np.stack(imgs_p)

    mean_b, mean_p = imgs_b.mean(), imgs_p.mean()
    assert abs(mean_b - mean_p) / mean_p < 0.06, (mean_b, mean_p)

    var_b = imgs_b.var(axis=0).mean()
    var_p = imgs_p.var(axis=0).mean()
    assert var_b > 1.5 * var_p, (var_b, var_p)


def test_prb_basic_grad_vs_prb():
    """The replay backward works without NEE: albedo gradient agrees with the
    (lower-variance) prb gradient estimate."""
    key = "white.reflectance.value"

    def grad_for(itype, spp, seed):
        scene = _cbox({"type": itype, "max_depth": 4})
        path = next(p for k, p in scene.param_paths if k == key)
        base = _tree_get(scene, path)

        def loss(v):
            return jnp.sum(mi.render(_tree_set(scene, path, v), spp=spp, seed=seed))

        return float(jnp.sum(jax.grad(loss)(base)))

    g_prb = grad_for("prb", 128, 5)
    g_basic = np.mean([grad_for("prb_basic", 256, s) for s in range(3)])
    assert g_prb != 0.0
    rel = abs(g_basic - g_prb) / abs(g_prb)
    assert rel < 0.15, (g_basic, g_prb, rel)
