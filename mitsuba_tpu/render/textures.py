"""Texture plugins (reference: src/textures/{bitmap,checkerboard}.cpp and the
spectra plugins src/spectra/* which subclass Texture in the reference).

A texture evaluates to an [N, C] spectrum given surface uv (+ per-lane sampled
wavelengths in spectral mode).  Dispatch is static (python isinstance) — each
BSDF/emitter parameter references exactly one texture object, so evaluation is
dense over the wavefront with no cross-texture gathers.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import spectrum as spec


def _to_channels(rgb_value, n_channels, wavelengths=None, is_emission=False):
    """Map stored rgb/mono data to the variant's channel count.
    Spectral mode upsamples rgb reflectances smoothly
    (reference: rgb2spec upsampling, src/core/spectrum.cpp)."""
    v = jnp.asarray(rgb_value, jnp.float32)
    if n_channels == 3:
        if v.shape[-1] == 3:
            return v
        return jnp.repeat(v[..., -1:], 3, axis=-1)
    if n_channels == 1:
        if v.shape[-1] == 3:
            return spec.luminance(v)[..., None]
        return v
    # spectral: wavelengths [N, 4]
    if v.shape[-1] == 1:
        return jnp.broadcast_to(v, v.shape[:-1] + (wavelengths.shape[-1],))
    if is_emission:
        # emissive rgb: unbounded D65-based upsampling (d65.cpp:95-108)
        return spec.rgb_emission_eval(v[..., None, :], wavelengths)
    return spec.rgb_reflectance_eval(v[..., None, :], wavelengths)


@struct.dataclass
class ConstantTexture:
    """Uniform value (reference: src/spectra/uniform.cpp, srgb.cpp).
    `emissive` selects the unbounded D65 spectral upsampling used for
    radiance quantities (reference: xml.cpp within_emitter)."""

    value: jnp.ndarray   # [3] rgb or [1] scalar
    emissive: bool = struct.field(pytree_node=False, default=False)

    def eval(self, uv, wavelengths, n_channels):
        out = _to_channels(self.value, n_channels, wavelengths, self.emissive)
        n = uv.shape[0]
        return jnp.broadcast_to(out, (n, n_channels))

    def mean(self):
        return jnp.mean(self.value)


@struct.dataclass
class CheckerboardTexture:
    """2x2-tiled checkerboard (reference: src/textures/checkerboard.cpp)."""

    color0: jnp.ndarray
    color1: jnp.ndarray
    uv_scale: jnp.ndarray  # [2]
    uv_offset: jnp.ndarray  # [2]

    def eval(self, uv, wavelengths, n_channels):
        st = uv * self.uv_scale + self.uv_offset
        mask = (jnp.floor(st[..., 0]).astype(jnp.int32) ^ jnp.floor(st[..., 1]).astype(jnp.int32)) & 1
        c0 = _to_channels(self.color0, n_channels, wavelengths)
        c1 = _to_channels(self.color1, n_channels, wavelengths)
        c0 = jnp.broadcast_to(c0, (uv.shape[0], n_channels))
        c1 = jnp.broadcast_to(c1, (uv.shape[0], n_channels))
        return jnp.where((mask == 0)[..., None], c0, c1)

    def mean(self):
        return 0.5 * (jnp.mean(self.color0) + jnp.mean(self.color1))


@struct.dataclass
class BitmapTexture:
    """Image texture with bilinear filtering (reference: src/textures/bitmap.cpp).
    data is [H, W, 3] (or [H, W, 1]); stored in HBM, gathered per lane."""

    data: jnp.ndarray
    emissive: bool = struct.field(pytree_node=False, default=False)

    def eval(self, uv, wavelengths, n_channels):
        h, w = self.data.shape[0], self.data.shape[1]
        x = uv[..., 0] * w - 0.5
        y = (1.0 - uv[..., 1]) * h - 0.5   # flip v: image row 0 is top
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        d = self.data
        v00 = d[y0i, x0i]
        v01 = d[y0i, x1i]
        v10 = d[y1i, x0i]
        v11 = d[y1i, x1i]
        v = (
            v00 * ((1 - fx) * (1 - fy))[..., None]
            + v01 * (fx * (1 - fy))[..., None]
            + v10 * ((1 - fx) * fy)[..., None]
            + v11 * (fx * fy)[..., None]
        )
        return _to_channels(v, n_channels, wavelengths)

    def mean(self):
        return jnp.mean(self.data)


@struct.dataclass
class SingletonSpectrum:
    """Fork addition: constant value at exactly one wavelength
    (reference: src/spectra/singleton.cpp:18-82).  In spectral mode,
    sample_spectrum deterministically returns (wavelength, value)."""

    value: jnp.ndarray       # scalar [1]
    wavelength: jnp.ndarray  # scalar [1]

    def eval(self, uv, wavelengths, n_channels):
        n = uv.shape[0]
        if wavelengths is None:
            return jnp.broadcast_to(self.value, (n, n_channels))
        # nonzero only at (numerically near) its own wavelength
        match = jnp.abs(wavelengths - self.wavelength) < 1.0
        return jnp.where(match, self.value, 0.0)

    def mean(self):
        return jnp.mean(self.value)


@struct.dataclass
class D65Spectrum:
    """D65 illuminant scaled by `scale` (reference: src/spectra/d65.cpp)."""

    scale: jnp.ndarray

    def eval(self, uv, wavelengths, n_channels):
        n = uv.shape[0]
        if wavelengths is None:
            return jnp.broadcast_to(self.scale, (n, n_channels))
        return spec.d65_approx(wavelengths) * self.scale

    def mean(self):
        return jnp.mean(self.scale)


@struct.dataclass
class BlackbodySpectrum:
    """Planck emitter (reference: src/spectra/blackbody.cpp)."""

    temperature: jnp.ndarray
    scale: jnp.ndarray

    def eval(self, uv, wavelengths, n_channels):
        n = uv.shape[0]
        if wavelengths is None:
            return jnp.broadcast_to(self.scale, (n, n_channels))
        return spec.blackbody_radiance(wavelengths, self.temperature) * self.scale

    def mean(self):
        return jnp.mean(self.scale)


@struct.dataclass
class RegularSpectrum:
    """Regularly sampled spectrum on [wl_min, wl_max]
    (reference: src/spectra/regular.cpp)."""

    values: jnp.ndarray   # [K]
    wl_min: jnp.ndarray
    wl_max: jnp.ndarray

    def eval(self, uv, wavelengths, n_channels):
        n = uv.shape[0]
        if wavelengths is None:
            return jnp.broadcast_to(jnp.mean(self.values), (n, n_channels))
        k = self.values.shape[0]
        t = (wavelengths - self.wl_min) / (self.wl_max - self.wl_min) * (k - 1)
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, k - 2)
        f = jnp.clip(t - i, 0.0, 1.0)
        val = self.values[i] * (1 - f) + self.values[i + 1] * f
        inside = (t >= 0) & (t <= k - 1)
        return jnp.where(inside, val, 0.0)

    def mean(self):
        return jnp.mean(self.values)


@struct.dataclass
class IrregularSpectrum:
    """Irregularly sampled spectrum (reference: src/spectra/irregular.cpp)."""

    wavelengths_nodes: jnp.ndarray   # [K]
    values: jnp.ndarray              # [K]

    def eval(self, uv, wavelengths, n_channels):
        n = uv.shape[0]
        if wavelengths is None:
            return jnp.broadcast_to(jnp.mean(self.values), (n, n_channels))
        i = jnp.clip(
            jnp.searchsorted(self.wavelengths_nodes, wavelengths, side="right", method="compare_all") - 1,
            0,
            self.wavelengths_nodes.shape[0] - 2,
        )
        x0 = self.wavelengths_nodes[i]
        x1 = self.wavelengths_nodes[i + 1]
        f = jnp.clip((wavelengths - x0) / jnp.maximum(x1 - x0, 1e-9), 0.0, 1.0)
        val = self.values[i] * (1 - f) + self.values[i + 1] * f
        inside = (wavelengths >= self.wavelengths_nodes[0]) & (
            wavelengths <= self.wavelengths_nodes[-1]
        )
        return jnp.where(inside, val, 0.0)

    def mean(self):
        return jnp.mean(self.values)


def tex_eval(tex, si, wavelengths, n_channels):
    """Texture dispatch: position/primitive-aware textures define eval_si
    (reference: src/textures/volume.cpp evaluates at it.p, mesh_attribute.cpp
    at (prim_index, prim_uv)); plain textures read si.uv."""
    if hasattr(tex, "eval_si"):
        return tex.eval_si(si, wavelengths, n_channels)
    return tex.eval(si.uv, wavelengths, n_channels)


@struct.dataclass
class VolumeTexture:
    """3D texture slice: evaluates a Volume at the surface hit position
    (reference: src/textures/volume.cpp)."""

    volume: object          # ConstVolume / GridVolume
    emissive: bool = struct.field(pytree_node=False, default=False)

    def eval_si(self, si, wavelengths, n_channels):
        v3 = self.volume.eval(si.p, 3)
        return _to_channels(v3, n_channels, wavelengths, self.emissive)

    def eval(self, uv, wavelengths, n_channels):
        # uv-only call sites (e.g. emitter radiance re-eval) fall back to the
        # volume's mean value — positionless queries have no 3D location
        n = uv.shape[0]
        m = jnp.mean(self.volume.data, axis=(0, 1, 2)) if hasattr(self.volume, "data") \
            else self.volume.eval(jnp.zeros((1, 3)), 3)[0]
        v3 = jnp.broadcast_to(jnp.atleast_1d(m), (n, 3)) if m.ndim == 0 or m.shape[-1] != 3 \
            else jnp.broadcast_to(m, (n, 3))
        return _to_channels(v3, n_channels, wavelengths, self.emissive)

    def mean(self):
        if hasattr(self.volume, "data"):
            return jnp.mean(self.volume.data)
        return self.volume.max()


@struct.dataclass
class MeshAttributeTexture:
    """Per-vertex mesh attribute interpolated at the hit's barycentrics
    (reference: src/textures/mesh_attribute.cpp).  values3 holds the
    attribute pre-gathered per (triangle, corner) for the owning mesh;
    prim_offset maps global prim indices to the mesh's local triangle table.
    Built by the loader after the geometry compile."""

    values3: jnp.ndarray    # [F, 3, C]
    prim_offset: int = struct.field(pytree_node=False, default=0)
    name: str = struct.field(pytree_node=False, default="")

    def eval_si(self, si, wavelengths, n_channels):
        F = self.values3.shape[0]
        lp = jnp.clip(si.prim_index - self.prim_offset, 0, max(F - 1, 0))
        rows = self.values3[lp]                      # [N, 3, C]
        b1 = si.prim_uv[..., 0:1]
        b2 = si.prim_uv[..., 1:2]
        v = rows[:, 0] * (1.0 - b1 - b2) + rows[:, 1] * b1 + rows[:, 2] * b2
        if v.shape[-1] == 1:
            v = jnp.broadcast_to(v, v.shape[:-1] + (3,))
        return _to_channels(v[..., :3], n_channels, wavelengths, False)

    def eval(self, uv, wavelengths, n_channels):
        n = uv.shape[0]
        m = jnp.mean(self.values3.reshape(-1, self.values3.shape[-1]), axis=0)
        if m.shape[-1] == 1:
            m = jnp.broadcast_to(m, (3,))
        return _to_channels(jnp.broadcast_to(m[:3], (n, 3)), n_channels, wavelengths, False)

    def mean(self):
        return jnp.mean(self.values3)
