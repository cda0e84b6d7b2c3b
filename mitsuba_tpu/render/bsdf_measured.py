"""Data-driven measured BSDF (reference: src/bsdfs/measured.cpp; Dupuy &
Jakob 2018, "An Adaptive Parameterization for Efficient Material Acquisition
and Rendering").

Loads the RGL `.bsdf` tensor-file format (reference: src/core/tensor.cpp)
and reproduces the reference's sampling chain exactly: luminance warp ->
VNDF warp -> microfacet mirror reflection, with the spectra tensor evaluated
at the VNDF-warp unit-square position (so eval/pdf go through
Marginal2D.invert).  RGB files drive the 'wavelength' parameter with channel
indices {0,1,2}; spectral files use the hero wavelengths directly.
"""
from __future__ import annotations

import struct as pystruct

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..core.distr2d import MarginalContinuous2D
from .records import BSDFSample

_DTYPES = {
    1: np.uint8, 2: np.int8, 3: np.uint16, 4: np.int16,
    5: np.uint32, 6: np.int32, 7: np.uint64, 8: np.int64,
    9: np.float16, 10: np.float32, 11: np.float64,
}


def load_tensor_file(filename):
    """Reader for the reference's tensor-file container
    (src/core/tensor.cpp: 'tensor_file' magic, u16 name_len/name/u16 ndim/
    u8 dtype/u64 offset/ndim x u64 shape per field)."""
    with open(filename, "rb") as f:
        buf = f.read()
    if buf[:12] != b"tensor_file\x00":
        raise ValueError(f"{filename}: not a tensor file")
    (n_fields,) = pystruct.unpack_from("<I", buf, 14)
    pos = 18
    fields = {}
    for _ in range(n_fields):
        (name_len,) = pystruct.unpack_from("<H", buf, pos)
        pos += 2
        name = buf[pos : pos + name_len].decode()
        pos += name_len
        ndim, dtype = pystruct.unpack_from("<HB", buf, pos)
        pos += 3
        (offset,) = pystruct.unpack_from("<Q", buf, pos)
        pos += 8
        shape = pystruct.unpack_from(f"<{ndim}Q", buf, pos)
        pos += 8 * ndim
        dt = _DTYPES[dtype]
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(buf, dt, count, offset).reshape(shape)
        fields[name] = arr
    return fields


def write_tensor_file(filename, fields):
    """Writer for the same container (tests synthesize .bsdf files from
    analytic models; no network access to the RGL database here)."""
    names = list(fields.keys())
    rev = {v: k for k, v in _DTYPES.items()}
    header = b"tensor_file\x00" + bytes([1, 0]) + pystruct.pack("<I", len(names))
    entries = []
    sz = len(header)
    for name in names:
        arr = np.ascontiguousarray(fields[name])
        e = pystruct.pack("<H", len(name)) + name.encode()
        e += pystruct.pack("<HB", arr.ndim, rev[arr.dtype.type])
        sz += len(e) + 8 + 8 * arr.ndim
        entries.append((e, arr))
    blobs = []
    offset = sz
    body = b""
    for e, arr in entries:
        body += e + pystruct.pack("<Q", offset)
        body += pystruct.pack(f"<{arr.ndim}Q", *arr.shape)
        blobs.append(arr.tobytes())
        offset += len(blobs[-1])
    with open(filename, "wb") as f:
        f.write(header + body + b"".join(blobs))


def _elevation(d):
    """Numerically stable elevation (measured.cpp:244-247)."""
    dist = jnp.sqrt(
        d[..., 0] ** 2 + d[..., 1] ** 2 + (d[..., 2] - 1.0) ** 2
    )
    return 2.0 * jnp.arcsin(jnp.clip(0.5 * dist, -1.0, 1.0))


def _u2theta(u):
    return u * u * (jnp.pi / 2.0)


def _u2phi(u):
    return (2.0 * u - 1.0) * jnp.pi


def _theta2u(theta):
    return jnp.sqrt(jnp.maximum(theta, 0.0) * (2.0 / jnp.pi))


def _phi2u(phi):
    return (phi + jnp.pi) * (0.5 / jnp.pi)


def _mulsign_neg(a, b):
    return jnp.where(b >= 0, -a, a)


@struct.dataclass
class MeasuredBSDF:
    """(reference: src/bsdfs/measured.cpp:193-470)."""

    ndf: MarginalContinuous2D        # eval-only, unnormalized
    sigma: MarginalContinuous2D      # eval-only, unnormalized
    vndf: MarginalContinuous2D       # 2-param warp (phi_i, theta_i)
    luminance: MarginalContinuous2D  # 2-param warp
    spectra: MarginalContinuous2D    # 3-param eval (phi_i, theta_i, lambda)
    wavelengths: jnp.ndarray         # spectral grid, or [0,1,2] for RGB
    isotropic: bool = struct.field(pytree_node=False, default=True)
    jacobian: bool = struct.field(pytree_node=False, default=False)
    reduction: int = struct.field(pytree_node=False, default=0)
    spectral: bool = struct.field(pytree_node=False, default=False)

    flags_smooth = True
    flags_transmission = False

    @staticmethod
    def from_file(filename):
        tf = load_tensor_file(filename)
        theta_i = tf["theta_i"].astype(np.float32)
        phi_i = tf["phi_i"].astype(np.float32)
        spectral = "wavelengths" in tf
        if spectral:
            wav = tf["wavelengths"].astype(np.float32)
            spectra = tf["spectra"].astype(np.float32)
        else:
            wav = np.array([0.0, 1.0, 2.0], np.float32)
            spectra = tf["rgb"].astype(np.float32)
        isotropic = phi_i.shape[0] <= 2
        reduction = 0
        if not isotropic:
            reduction = int(round((2 * np.pi) / (phi_i[-1] - phi_i[0])))
        jac = bool(tf["jacobian"].reshape(-1)[0])
        return MeasuredBSDF(
            ndf=MarginalContinuous2D.create(tf["ndf"].astype(np.float32), (), normalize=False),
            sigma=MarginalContinuous2D.create(tf["sigma"].astype(np.float32), (), normalize=False),
            vndf=MarginalContinuous2D.create(
                tf["vndf"].astype(np.float32), (phi_i, theta_i)
            ),
            luminance=MarginalContinuous2D.create(
                tf["luminance"].astype(np.float32), (phi_i, theta_i)
            ),
            spectra=MarginalContinuous2D.create(
                spectra, (phi_i, theta_i, wav), normalize=False
            ),
            wavelengths=jnp.asarray(wav),
            isotropic=isotropic,
            jacobian=jac,
            reduction=reduction,
            spectral=spectral,
        )

    # ------------------------------------------------------------------
    def _reduce_in(self, wi, wo=None):
        if self.reduction < 2:
            return (wi, wo, None, None)
        sy = wi[..., 1]
        sx = wi[..., 0] if self.reduction == 4 else sy
        def red(v):
            return jnp.stack(
                [_mulsign_neg(v[..., 0], sx), _mulsign_neg(v[..., 1], sy), v[..., 2]],
                axis=-1,
            )
        return red(wi), (red(wo) if wo is not None else None), sx, sy

    def _spec_eval(self, sample_pos, phi_i, theta_i, wavelengths, n_channels):
        """spectra tensor at the warp position for each channel
        (measured.cpp:327-333)."""
        out = []
        for c in range(n_channels):
            if self.spectral and wavelengths is not None:
                lam = wavelengths[..., c]
            else:
                lam = jnp.full_like(phi_i, float(c))
            out.append(self.spectra.eval(sample_pos, (phi_i, theta_i, lam)))
        return jnp.stack(out, axis=-1)

    def _common(self, wi, wo):
        m = wi + wo
        m = m / jnp.maximum(
            jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12
        )
        theta_i = _elevation(wi)
        phi_i = jnp.arctan2(wi[..., 1], wi[..., 0])
        theta_m = _elevation(m)
        phi_m = jnp.arctan2(m[..., 1], m[..., 0])
        u_m_x = _theta2u(theta_m)
        u_m_y = _phi2u(phi_m - phi_i if self.isotropic else phi_m)
        u_m_y = u_m_y - jnp.floor(u_m_y)
        u_m = jnp.stack([u_m_x, u_m_y], axis=-1)
        return m, theta_i, phi_i, u_m

    def eval(self, si, wo, wavelengths, n_channels):
        wi, wo_r, _, _ = self._reduce_in(si.wi, wo)
        wo_r = wo_r if wo_r is not None else wo
        valid = (wi[..., 2] > 0) & (wo_r[..., 2] > 0)
        m, theta_i, phi_i, u_m = self._common(wi, wo_r)
        params = (phi_i, theta_i)
        sample_pos, _ = self.vndf.invert(u_m, params)
        spec = self._spec_eval(sample_pos, phi_i, theta_i, wavelengths, n_channels)
        if self.jacobian:
            u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], axis=-1)
            spec = spec * (
                self.ndf.eval(u_m, ())
                / (4.0 * jnp.maximum(self.sigma.eval(u_wi, ()), 1e-12))
            )[..., None]
        return jnp.where(valid[..., None], spec, 0.0)

    def pdf(self, si, wo):
        wi, wo_r, _, _ = self._reduce_in(si.wi, wo)
        wo_r = wo_r if wo_r is not None else wo
        valid = (wi[..., 2] > 0) & (wo_r[..., 2] > 0)
        m, theta_i, phi_i, u_m = self._common(wi, wo_r)
        params = (phi_i, theta_i)
        sample_pos, vndf_pdf = self.vndf.invert(u_m, params)
        lum_pdf = self.luminance.eval(sample_pos, params)
        sin_theta_m = jnp.sqrt(
            jnp.maximum(1.0 - m[..., 2] ** 2, 0.0)
        )
        jacobian = jnp.maximum(
            2.0 * jnp.pi**2 * u_m[..., 0] * sin_theta_m, 1e-6
        ) * 4.0 * jnp.sum(wi * m, axis=-1)
        pdf = vndf_pdf * lum_pdf / jacobian
        return jnp.where(valid, jnp.maximum(pdf, 0.0), 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        wi, _, sx, sy = self._reduce_in(si.wi)
        valid = wi[..., 2] > 0
        theta_i = _elevation(wi)
        phi_i = jnp.arctan2(wi[..., 1], wi[..., 0])
        params = (phi_i, theta_i)
        u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], axis=-1)

        # luminance warp first, then the VNDF warp (measured.cpp:283-292)
        s = jnp.stack([u2[..., 1], u2[..., 0]], axis=-1)
        s, lum_pdf = self.luminance.sample(s, params)
        u_m, ndf_pdf = self.vndf.sample(s, params)

        phi_m = _u2phi(u_m[..., 1])
        theta_m = _u2theta(u_m[..., 0])
        if self.isotropic:
            phi_m = phi_m + phi_i
        sin_t, cos_t = jnp.sin(theta_m), jnp.cos(theta_m)
        m = jnp.stack(
            [jnp.cos(phi_m) * sin_t, jnp.sin(phi_m) * sin_t, cos_t], axis=-1
        )
        jacobian = jnp.maximum(
            2.0 * jnp.pi**2 * u_m[..., 0] * sin_t, 1e-6
        ) * 4.0 * jnp.sum(wi * m, axis=-1)
        wo = 2.0 * jnp.sum(m * wi, axis=-1, keepdims=True) * m - wi
        pdf = ndf_pdf * lum_pdf / jacobian

        spec = self._spec_eval(s, phi_i, theta_i, wavelengths, n_channels)
        if self.jacobian:
            spec = spec * (
                self.ndf.eval(u_m, ())
                / (4.0 * jnp.maximum(self.sigma.eval(u_wi, ()), 1e-12))
            )[..., None]

        if self.reduction >= 2:
            wo = jnp.stack(
                [_mulsign_neg(wo[..., 0], sx), _mulsign_neg(wo[..., 1], sy), wo[..., 2]],
                axis=-1,
            )
        valid = valid & (wo[..., 2] > 0)
        pdf = jnp.where(valid, jnp.maximum(pdf, 0.0), 0.0)
        weight = jnp.where(
            (pdf > 0)[..., None], spec / jnp.maximum(pdf, 1e-20)[..., None], 0.0
        )
        bs = BSDFSample(
            wo=wo,
            pdf=pdf,
            eta=jnp.ones_like(pdf),
            delta=jnp.zeros(pdf.shape, bool),
        )
        return bs, weight
