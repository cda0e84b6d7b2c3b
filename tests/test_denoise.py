"""TPU denoiser (analog of the reference OptixDenoiser wrapper;
include/mitsuba/render/optixdenoiser.h:14-110)."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.utils.denoise import Denoiser, denoise


def _scene(H=64, W=64, seed=0):
    """Piecewise-constant two-region 'render' with matching albedo/normal
    guides; the clean image is known exactly."""
    rng = np.random.default_rng(seed)
    clean = np.zeros((H, W, 3), np.float32)
    clean[:, : W // 2] = [0.8, 0.2, 0.2]
    clean[:, W // 2:] = [0.1, 0.5, 0.9]
    albedo = clean.copy()
    normal = np.zeros((H, W, 3), np.float32)
    normal[:, : W // 2] = [0, 0, 1]
    normal[:, W // 2:] = [0, 1, 0]
    # unclipped noise: clipping at zero would bias the mean the tests check
    noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
    return clean, albedo, normal, noisy


def _mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_denoise_reduces_mse():
    clean, albedo, normal, noisy = _scene()
    out = denoise(jnp.asarray(noisy), albedo=jnp.asarray(albedo),
                  normals=jnp.asarray(normal))
    assert _mse(out, clean) < 0.1 * _mse(noisy, clean)


def test_denoise_preserves_guided_edges():
    """The albedo/normal edge at W/2 must survive aggressive filtering."""
    clean, albedo, normal, noisy = _scene()
    d = Denoiser(albedo=True, normals=True, iterations=5)
    out = np.asarray(d(jnp.asarray(noisy), albedo=jnp.asarray(albedo),
                       normals=jnp.asarray(normal)))
    W = clean.shape[1]
    left = out[:, : W // 2 - 2].mean(axis=(0, 1))
    right = out[:, W // 2 + 2:].mean(axis=(0, 1))
    np.testing.assert_allclose(left, clean[0, 0], atol=0.05)
    np.testing.assert_allclose(right, clean[0, -1], atol=0.05)


def test_denoise_color_only_fallback():
    """Without guide buffers the filter still denoises (and still beats the
    noisy input) — the reference also runs without albedo/normal layers."""
    clean, _, _, noisy = _scene(seed=1)
    out = denoise(jnp.asarray(noisy))
    assert _mse(out, clean) < 0.5 * _mse(noisy, clean)


def test_denoise_alpha_passthrough_and_shape():
    clean, albedo, normal, noisy = _scene(seed=2)
    alpha = np.ones(clean.shape[:2] + (1,), np.float32)
    rgba = np.concatenate([noisy, alpha], axis=-1)
    d = Denoiser(albedo=True, normals=True)
    out = np.asarray(d(jnp.asarray(rgba), albedo=jnp.asarray(albedo),
                       normals=jnp.asarray(normal), denoise_alpha=True))
    assert out.shape == rgba.shape
    np.testing.assert_allclose(out[..., 3], 1.0, atol=1e-3)


def test_denoise_temporal_blend():
    """Temporal mode: output pulls toward the (flow-warped) history frame
    (optixdenoiser.h:94-102)."""
    clean, albedo, normal, noisy = _scene(seed=3)
    prev = np.full_like(clean, 0.5)
    d = Denoiser(albedo=True, normals=True, temporal=True, history_weight=1.0)
    out = np.asarray(d(jnp.asarray(noisy), albedo=jnp.asarray(albedo),
                       normals=jnp.asarray(normal),
                       previous_denoised=jnp.asarray(prev),
                       flow=jnp.zeros(clean.shape[:2] + (2,), jnp.float32)))
    np.testing.assert_allclose(out, prev, atol=1e-5)


def test_denoise_temporal_flow_warp():
    """Nonzero flow shifts the history before blending."""
    H = W = 16
    prev = np.zeros((H, W, 3), np.float32)
    prev[:, : W // 2] = 1.0  # left half bright
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0] = -4.0  # history sampled 4 px to the right
    d = Denoiser(albedo=False, normals=False, temporal=True, history_weight=1.0)
    noisy = np.zeros((H, W, 3), np.float32)
    out = np.asarray(d(jnp.asarray(noisy), previous_denoised=jnp.asarray(prev),
                       flow=jnp.asarray(flow)))
    # bright boundary moved from W/2 to W/2 - 4
    assert out[0, W // 2 - 5, 0] > 0.9 and out[0, W // 2 - 3, 0] < 0.1


def test_denoise_jits():
    import jax

    clean, albedo, normal, noisy = _scene()
    d = Denoiser(albedo=True, normals=True, iterations=3)
    f = jax.jit(lambda n, a, m: d(n, albedo=a, normals=m))
    out = f(jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal))
    assert np.isfinite(np.asarray(out)).all()


def test_denoise_render_integration():
    """Low-spp cbox render + AOV guide buffers (albedo + sh_normal, the
    reference's denoiser feed, optixdenoiser.h:33-43): denoised image must be
    closer to a higher-spp render than the noisy input is."""
    import mitsuba_tpu as mi

    mi.set_variant("rgb")

    def _make(integrator=None):
        d = mi.cornell_box()
        d["sensor"]["film"]["width"] = 32
        d["sensor"]["film"]["height"] = 32
        if integrator is not None:
            d["integrator"] = integrator
        return mi.load_dict(d)

    scene = _make()
    noisy = mi.render(scene, spp=4, seed=0)
    ref = mi.render(scene, spp=256, seed=1)
    albedo = mi.render(_make({"type": "aov", "aovs": "a:albedo"}), spp=4, seed=0)
    normals = mi.render(_make({"type": "aov", "aovs": "nn:sh_normal"}), spp=4, seed=0)
    out = denoise(noisy, albedo=albedo, normals=normals)

    def relmse(a):  # standard HDR-denoising metric (relative MSE)
        r = np.asarray(ref)
        return float(np.mean((np.asarray(a) - r) ** 2 / (r**2 + 1e-2)))

    assert relmse(out) < 0.75 * relmse(noisy)
