"""Gradient correctness: PRB custom-vjp vs central finite differences and vs
tape-mode AD (reference pattern: src/integrators/tests/test_ad_integrators.py
— dict configs with one differentiable key each, FD reference, rel error
thresholds; bwd tolerance 0.05)."""
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


def _small_cbox(integrator, w=24, h=24):
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = h
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    d["integrator"] = integrator
    return mi.load_dict(d)


def _path_for(scene, key):
    for k, p in scene.param_paths:
        if k == key:
            return p
    raise KeyError(key)


def _loss(scene, path, value, spp, seed):
    s2 = _tree_set(scene, path, value)
    img = mi.render(s2, spp=spp, seed=seed)
    return jnp.sum(img)


def _fd_and_ad_grad(scene, key, spp=96, seed=3, eps=2e-3):
    """Scalar contraction: perturb the parameter along all-ones, adjoint =
    all-ones on the image.  Same seed for every evaluation (correlated FD)."""
    path = _path_for(scene, key)
    base = _tree_get(scene, path)
    ones = jnp.ones_like(base)

    f = lambda t: _loss(scene, path, base + t * ones, spp, seed)
    fd = (f(jnp.asarray(eps)) - f(jnp.asarray(-eps))) / (2 * eps)

    g = jax.grad(lambda v: _loss(scene, path, v, spp, seed))(base)
    ad = jnp.sum(g)
    return float(fd), float(ad)


@pytest.mark.parametrize("key", ["white.reflectance.value", "light.emitter.radiance.value"])
def test_prb_grad_vs_fd(key):
    scene = _small_cbox({"type": "prb", "max_depth": 4})
    assert getattr(scene.integrator, "is_prb", False)
    fd, ad = _fd_and_ad_grad(scene, key)
    assert fd != 0.0
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.05, (key, fd, ad, rel)


def test_prb_spp_grad_budget():
    """spp_grad gives the backward pass its own sample budget (reference:
    mi.render's spp_grad, util.py:551-560): gradients stay unbiased — a
    high-spp_grad estimate agrees with the FD reference — and the refold is
    exact: spp_grad == spp reproduces the default path bitwise."""
    scene = _small_cbox({"type": "prb", "max_depth": 4})
    key = "white.reflectance.value"
    path = _path_for(scene, key)
    base = _tree_get(scene, path)

    def loss(v, spp_grad):
        s2 = _tree_set(scene, path, v)
        return jnp.sum(mi.render(s2, spp=64, seed=3, spp_grad=spp_grad))

    g_default = jax.grad(lambda v: jnp.sum(
        mi.render(_tree_set(scene, path, v), spp=64, seed=3)))(base)
    g_same = jax.grad(lambda v: loss(v, 64))(base)
    np.testing.assert_array_equal(np.asarray(g_default), np.asarray(g_same))

    g_big = jax.grad(lambda v: loss(v, 256))(base)
    eps = 2e-3
    ones = jnp.ones_like(base)
    f = lambda t: jnp.sum(mi.render(
        _tree_set(scene, path, base + t * ones), spp=256, seed=3))
    fd = float((f(jnp.asarray(eps)) - f(jnp.asarray(-eps))) / (2 * eps))
    rel = abs(float(jnp.sum(g_big)) - fd) / max(abs(fd), 1e-3)
    assert rel < 0.05, (fd, float(jnp.sum(g_big)), rel)

    with pytest.raises(ValueError, match="PRB"):
        s_path = _small_cbox({"type": "path", "max_depth": 4})
        jax.grad(lambda v: jnp.sum(mi.render(
            _tree_set(s_path, _path_for(s_path, key), v),
            spp=64, seed=3, spp_grad=16)))(base)


def test_tape_grad_vs_fd_path():
    """Tape-mode AD through the scan (path integrator) against FD."""
    scene = _small_cbox({"type": "path", "max_depth": 4})
    fd, ad = _fd_and_ad_grad(scene, "red.reflectance.value")
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.05, (fd, ad, rel)


def test_prb_matches_tape():
    """PRB replay gradients must match tape gradients on the same seed
    (both differentiate the same detached-sampling estimator)."""
    key = "white.reflectance.value"
    s_prb = _small_cbox({"type": "prb", "max_depth": 4})
    s_path = _small_cbox({"type": "path", "max_depth": 4})
    path = _path_for(s_prb, key)
    base = _tree_get(s_prb, path)

    g_prb = jax.grad(lambda v: _loss(s_prb, path, v, 64, 5))(base)
    g_tape = jax.grad(lambda v: _loss(s_path, path, v, 64, 5))(base)
    np.testing.assert_allclose(
        np.asarray(g_prb), np.asarray(g_tape), rtol=2e-2, atol=1e-2
    )


def test_prb_primal_matches_path():
    """PRB primal pass is the ordinary path trace (identical RNG order)."""
    s_prb = _small_cbox({"type": "prb", "max_depth": 4})
    s_path = _small_cbox({"type": "path", "max_depth": 4})
    a = np.asarray(mi.render(s_prb, spp=16, seed=9))
    b = np.asarray(mi.render(s_path, spp=16, seed=9))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_texture_gradient():
    """BASELINE config 2: albedo-*texture* gradient (bitmap texel grads
    flow through the bilinear lookup)."""
    tex = np.full((8, 8, 3), 0.5, np.float32)
    d = mi.cornell_box()
    d["sensor"]["film"]["width"] = 24
    d["sensor"]["film"]["height"] = 24
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    d["integrator"] = {"type": "prb", "max_depth": 3}
    d["floor"]["bsdf"] = {"type": "bitmap_diffuse_inline"}  # replaced below
    d["floor"]["bsdf"] = {
        "type": "diffuse",
        "reflectance": {"type": "bitmap", "data": tex},
    }
    scene = mi.load_dict(d)
    key = "floor.bsdf.reflectance.data"
    path = _path_for(scene, key)
    base = _tree_get(scene, path)

    g = jax.grad(lambda v: _loss(scene, path, v, 64, 2))(base)
    g = np.asarray(g)
    assert g.shape == (8, 8, 3)
    assert (g >= -1e-6).all()          # more floor albedo -> more light
    assert g.sum() > 0.1               # nonzero gradient signal
    # FD cross-check on the texture contraction
    fd, ad = _fd_and_ad_grad(scene, key, spp=96, seed=2)
    rel = abs(ad - fd) / max(abs(fd), 1e-3)
    assert rel < 0.06, (fd, ad, rel)


def test_optimizer_recovers_albedo():
    """Small inverse-rendering loop: recover the white-wall albedo from a
    target image (reference workflow: docs tutorials + ad/optimizers.py)."""
    key = "white.reflectance.value"
    scene = _small_cbox({"type": "prb", "max_depth": 3}, w=16, h=16)
    path = _path_for(scene, key)
    target_value = _tree_get(scene, path)
    target = mi.render(scene, spp=256, seed=11)   # low-noise target

    # start from a wrong albedo
    scene0 = _tree_set(scene, path, jnp.asarray([0.3, 0.3, 0.3]))
    opt = mi.ad.Adam(lr=0.08)
    opt[key] = _tree_get(scene0, path)

    def loss_fn(v, seed):
        s2 = _tree_set(scene0, path, v)
        img = mi.render(s2, spp=32, seed=seed)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.grad(loss_fn)
    avg = None
    for it in range(60):
        g = grad_fn(opt[key], 100 + it)   # fresh seed: SGD on the true loss
        opt.step({key: g})
        if it >= 45:  # average the last iterates to smooth SGD noise
            avg = opt[key] if avg is None else avg + opt[key]
    final = np.asarray(avg / 15.0)
    np.testing.assert_allclose(final, np.asarray(target_value), atol=0.08)


def test_render_forward_matches_reverse():
    """Forward-mode dI/dtheta (render_forward) agrees with reverse-mode on a
    tape integrator (reference: Integrator::render_forward contract)."""
    scene = _small_cbox({"type": "path", "max_depth": 4})
    key = "white.reflectance.value"
    dimg = np.asarray(mi.render_forward(scene, key=key, spp=32, seed=7))
    assert dimg.shape == np.asarray(mi.render(scene, spp=1, seed=0)).shape
    # reverse-mode check on the summed image
    path = _path_for(scene, key)
    base = _tree_get(scene, path)
    g = jax.grad(
        lambda v: jnp.sum(mi.render(_tree_set(scene, path, v), spp=32, seed=7))
    )(base)
    np.testing.assert_allclose(dimg.sum(), np.asarray(g).sum(), rtol=1e-3)


def test_render_forward_rejects_prb():
    scene = _small_cbox({"type": "prb", "max_depth": 4})
    with pytest.raises(NotImplementedError):
        mi.render_forward(scene, key="white.reflectance.value", spp=4)
