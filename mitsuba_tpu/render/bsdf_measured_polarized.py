"""Measured polarized pBRDF (reference: src/bsdfs/measured_polarized.cpp).

Loads the KAIST .pbsdf tensor-file format (Baek et al. 2020, "Image-Based
Acquisition and Modeling of Polarimetric Reflectance"): a dense
[phi_d, theta_d, theta_h, wavelength, 4, 4] Mueller-matrix grid in the
isotropic Rusinkiewicz parameterization.  Eval performs 4-D multilinear
interpolation of the full 4x4 Mueller matrix (the reference routes this
through Marginal2D<4,true>.eval at the 16 lattice points (j/3, i/3) —
measured_polarized.cpp:259-283 — which reduces to exactly this
interpolation), then rotates the tabulated Stokes frames (which lie in the
plane of reflection, Fig. 4 of the paper) into the implicit stokes_basis
frames of the propagation directions (measured_polarized.cpp:245-300).

Sampling does not use the data: a cosine-hemisphere / GGX-microfacet
mixture with user-set `alpha_sample` roughness importance-samples outgoing
directions (measured_polarized.cpp:176-214, COSINE_HEMISPHERE_PDF_WEIGHT).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..core import warp
from . import microfacet as mf
from . import mueller as mu
from .records import BSDFSample

_COS_WEIGHT = 0.1  # COSINE_HEMISPHERE_PDF_WEIGHT (measured_polarized.cpp:13)


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def _rotate_z(v, angle):
    """Rotate v about +z by angle (measured_polarized.cpp rotate_vector with
    axis=(0,0,1))."""
    s, c = jnp.sin(angle), jnp.cos(angle)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)


def _rusinkiewicz(i, o):
    """(phi_d, theta_h, theta_d) of the isotropic Rusinkiewicz
    parameterization (measured_polarized.cpp:directions_to_rusinkiewicz)."""
    h = _normalize(i + o)
    n = jnp.zeros_like(h).at[..., 2].set(1.0)
    b = _normalize(jnp.cross(n, h))
    t = _normalize(jnp.cross(b, h))
    td = jnp.arccos(jnp.clip(jnp.sum(h * i, axis=-1), -1.0, 1.0))
    th = jnp.arccos(jnp.clip(h[..., 2], -1.0, 1.0))
    i_prj = _normalize(i - jnp.sum(i * h, axis=-1, keepdims=True) * h)
    cos_pd = jnp.clip(jnp.sum(t * i_prj, axis=-1), -1.0, 1.0)
    sin_pd = jnp.clip(jnp.sum(b * i_prj, axis=-1), -1.0, 1.0)
    pd = jnp.arctan2(sin_pd, cos_pd)
    return pd, th, td


def _grid_locate(grid, x):
    """Cell index + interpolation weight on a 1-D irregular grid."""
    n = grid.shape[0]
    idx = jnp.clip(jnp.searchsorted(grid, x, side="right") - 1, 0, max(n - 2, 0))
    g0 = grid[idx]
    g1 = grid[jnp.minimum(idx + 1, n - 1)]
    w = jnp.where(g1 > g0, (x - g0) / jnp.maximum(g1 - g0, 1e-12), 0.0)
    return idx, jnp.clip(w, 0.0, 1.0)


@struct.dataclass
class MeasuredPolarizedBSDF:
    """(reference: src/bsdfs/measured_polarized.cpp:106-403)."""

    table: jnp.ndarray        # [Np, Nd, Nh, Nw, 4, 4] Mueller grid
    phi_d_grid: jnp.ndarray   # [Np]
    theta_d_grid: jnp.ndarray # [Nd]
    theta_h_grid: jnp.ndarray # [Nh]
    wvl_grid: jnp.ndarray     # [Nw] nm
    alpha_sample: float = struct.field(pytree_node=False, default=0.1)
    wavelength: float = struct.field(pytree_node=False, default=-1.0)

    flags_smooth = True
    flags_transmission = False

    @staticmethod
    def from_file(filename, alpha_sample=0.1, wavelength=-1.0):
        from .bsdf_measured import load_tensor_file

        tf = load_tensor_file(filename)
        pbrdf = tf["M"].astype(np.float32)
        if pbrdf.ndim != 6 or pbrdf.shape[4:] != (4, 4):
            raise ValueError(f"{filename}: invalid pBSDF tensor structure")
        return MeasuredPolarizedBSDF(
            table=jnp.asarray(pbrdf),
            phi_d_grid=jnp.asarray(tf["phi_d"].reshape(-1).astype(np.float32)),
            theta_d_grid=jnp.asarray(tf["theta_d"].reshape(-1).astype(np.float32)),
            theta_h_grid=jnp.asarray(tf["theta_h"].reshape(-1).astype(np.float32)),
            wvl_grid=jnp.asarray(tf["wvls"].reshape(-1).astype(np.float32)),
            alpha_sample=float(alpha_sample),
            wavelength=float(wavelength),
        )

    # ------------------------------------------------------------------
    def _interp(self, phi_d, theta_d, theta_h, lam):
        """4-D multilinear interpolation -> [..., 4, 4] Mueller matrix."""
        ip, wp = _grid_locate(self.phi_d_grid, phi_d)
        id_, wd = _grid_locate(self.theta_d_grid, theta_d)
        ih, wh = _grid_locate(self.theta_h_grid, theta_h)
        iw, ww = _grid_locate(self.wvl_grid, lam)
        out = 0.0
        for dp in (0, 1):
            for dd in (0, 1):
                for dh in (0, 1):
                    for dw in (0, 1):
                        w = (
                            (wp if dp else 1.0 - wp)
                            * (wd if dd else 1.0 - wd)
                            * (wh if dh else 1.0 - wh)
                            * (ww if dw else 1.0 - ww)
                        )
                        corner = self.table[
                            jnp.minimum(ip + dp, self.phi_d_grid.shape[0] - 1),
                            jnp.minimum(id_ + dd, self.theta_d_grid.shape[0] - 1),
                            jnp.minimum(ih + dh, self.theta_h_grid.shape[0] - 1),
                            jnp.minimum(iw + dw, self.wvl_grid.shape[0] - 1),
                        ]
                        out = out + w[..., None, None] * corner
        return out

    def _lookup(self, phi_d, theta_h, theta_d, wavelengths, n_channels):
        """[..., C, 4, 4] raw tabulated Mueller per channel; NaN cells zeroed
        (transmission configurations are NaN-encoded in the dataset,
        measured_polarized.cpp:285-288)."""
        chans = []
        for c in range(n_channels):
            if self.wavelength >= 0.0 or wavelengths is None:
                lam = jnp.full_like(phi_d, max(self.wavelength, 0.0))
            else:
                lam = wavelengths[..., c]
            chans.append(self._interp(phi_d, theta_d, theta_h, lam))
        M = jnp.stack(chans, axis=-3)  # [..., C, 4, 4]
        bad = jnp.any(jnp.isnan(M[..., 0, 0]), axis=-1)  # any channel NaN
        M = jnp.where(bad[..., None, None, None], 0.0, jnp.nan_to_num(M))
        return M.at[..., 0, 0].set(jnp.maximum(M[..., 0, 0], 0.0))

    def _mueller(self, si, wo, wavelengths, n_channels):
        """Tabulated Mueller rotated into the implicit stokes_basis frames of
        (-wo, si.wi) — the local-frame convention Scene.bsdf_eval_pdf_pol
        expects before its to_world_mueller (measured_polarized.cpp:217-300,
        radiance transport: light arrives along -wo_hat=-wo, leaves along
        +wi_hat=+si.wi)."""
        wo_hat, wi_hat = wo, si.wi
        phi_std = jnp.arctan2(wi_hat[..., 1], wi_hat[..., 0])
        phi_std = jnp.where(phi_std < 0, phi_std + 2.0 * jnp.pi, phi_std)
        wo_std = _rotate_z(wo_hat, -phi_std)
        wi_std = _rotate_z(wi_hat, -phi_std)
        phi_d, theta_h, theta_d = _rusinkiewicz(wo_std, wi_std)
        M = self._lookup(phi_d, theta_h, theta_d, wavelengths, n_channels)

        # Tabulated Stokes reference vectors lie in the plane of reflection
        zo = -wo_std
        to = _normalize(jnp.cross(wo_std - wi_std, zo))
        yo = _normalize(jnp.cross(to, zo))
        xo = jnp.cross(yo, zo)
        zi = wi_std
        ti = _normalize(jnp.cross(wi_std - wo_std, zi))
        yi = _normalize(jnp.cross(ti, zi))
        xi = jnp.cross(yi, zi)
        xo_hat = _rotate_z(xo, phi_std)
        xi_hat = _rotate_z(xi, phi_std)
        # R_out * M * R_in^T with M carrying a channel axis [N, C, 4, 4]
        R_in = mu.rotate_stokes_basis(-wo_hat, xo_hat, mu.stokes_basis(-wo_hat))
        R_out = mu.rotate_stokes_basis(wi_hat, xi_hat, mu.stokes_basis(wi_hat))
        return (
            R_out[..., None, :, :]
            @ M
            @ jnp.swapaxes(R_in, -1, -2)[..., None, :, :]
        )

    # -- BSDF interface -------------------------------------------------
    def eval(self, si, wo, wavelengths, n_channels):
        """Unpolarized eval = M00 * cos_theta_o
        (measured_polarized.cpp:302-325 non-polarized branch)."""
        cos_i, cos_o = si.wi[..., 2], wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        wo_hat, wi_hat = wo, si.wi
        phi_std = jnp.arctan2(wi_hat[..., 1], wi_hat[..., 0])
        phi_std = jnp.where(phi_std < 0, phi_std + 2.0 * jnp.pi, phi_std)
        phi_d, theta_h, theta_d = _rusinkiewicz(
            _rotate_z(wo_hat, -phi_std), _rotate_z(wi_hat, -phi_std)
        )
        M = self._lookup(phi_d, theta_h, theta_d, wavelengths, n_channels)
        val = M[..., 0, 0] * jnp.maximum(cos_o, 0.0)[..., None]
        return jnp.where(valid[..., None], val, 0.0)

    def pdf(self, si, wo):
        """Cosine/GGX mixture pdf (measured_polarized.cpp:327-352)."""
        cos_i, cos_o = si.wi[..., 2], wo[..., 2]
        h = _normalize(si.wi + wo)
        pdf_cos = warp.square_to_cosine_hemisphere_pdf(wo)
        pdf_mf = mf.ggx_pdf_visible(si.wi, h, self.alpha_sample, self.alpha_sample)
        pdf_mf = pdf_mf / jnp.maximum(4.0 * jnp.sum(wo * h, axis=-1), 1e-9)
        p = _COS_WEIGHT * pdf_cos + (1.0 - _COS_WEIGHT) * pdf_mf
        return jnp.where((cos_i > 0) & (cos_o > 0), jnp.maximum(p, 0.0), 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        """(measured_polarized.cpp:176-214)."""
        valid = si.wi[..., 2] > 0
        wo_diff = warp.square_to_cosine_hemisphere(u2)
        m = mf.ggx_sample_vndf(
            si.wi, u2[..., 0], u2[..., 1], self.alpha_sample, self.alpha_sample
        )
        wo_spec = 2.0 * jnp.sum(m * si.wi, axis=-1, keepdims=True) * m - si.wi
        take_diff = u_lobe < _COS_WEIGHT
        wo = jnp.where(take_diff[..., None], wo_diff, wo_spec)
        pdf = self.pdf(si, wo)
        value = self.eval(si, wo, wavelengths, n_channels)
        weight = jnp.where(
            (valid & (pdf > 0))[..., None],
            value / jnp.maximum(pdf, 1e-20)[..., None],
            0.0,
        )
        bs = BSDFSample(
            wo=wo,
            pdf=jnp.where(valid, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            delta=jnp.zeros(pdf.shape, bool),
        )
        return bs, weight

    # -- polarized interface ---------------------------------------------
    def eval_pdf_mueller(self, si, wo, wavelengths, n_channels):
        cos_i, cos_o = si.wi[..., 2], wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        M = self._mueller(si, wo, wavelengths, n_channels)
        M = M * jnp.maximum(cos_o, 0.0)[..., None, None, None]
        M = jnp.where(valid[..., None, None, None], M, 0.0)
        return M, self.pdf(si, wo)

    def sample_pol(self, u_lobe, u2, si, wavelengths, n_channels):
        bs, _ = self.sample(u_lobe, u2, si, wavelengths, n_channels)
        M, pdf = self.eval_pdf_mueller(si, bs.wo, wavelengths, n_channels)
        w = M / jnp.maximum(pdf, 1e-12)[..., None, None, None]
        return bs, jnp.where((pdf > 1e-12)[..., None, None, None], w, 0.0)
