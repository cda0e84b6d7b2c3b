"""Phase functions (reference: src/phase/*, include/mitsuba/render/phase.h).

Fork conventions mirrored exactly (load-bearing for Mueller bookkeeping):
  * the medium interaction's shading frame is Frame(ray.d) and the incident
    direction in local space is wi = (0,0,-1)
    (reference: src/render/medium.cpp:47-54)
  * sample() returns a *local* direction wo plus a full Spectrum weight and
    pdf — (wo, weight, pdf), the fork's extended signature
    (reference: include/mitsuba/render/phase.h:134-156); the integrator
    converts with mei.to_world(wo).
  * For HG/tabulated phases the scattering angle satisfies
    cos(theta) = dot(wi, wo) = -wo.z.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import warp
from ..core.math import INV_FOUR_PI
from ..core.frame import cross, normalize, coordinate_system
from . import mueller as mu


def rotate_phase_mueller(M, wo_hat, wi_hat):
    """Rotate a scattering-plane-basis phase Mueller matrix to the implicit
    local Stokes bases of -wo_hat (in) and wi_hat (out) — the pattern of
    tabphase_polarized.cpp:168-196: the matrix's reference vector lies IN the
    scattering plane; collinear directions produce NaN -> zeroed entries.

    M: [N, C, 4, 4]; wo_hat/wi_hat: [N, 3] (light arrives along -wo_hat,
    leaves along +wi_hat)."""
    x_hat = cross(-wo_hat, wi_hat)
    p_axis_in = normalize(cross(x_hat, -wo_hat))
    p_axis_out = normalize(cross(x_hat, wi_hat))
    out = mu.rotate_mueller_basis(
        M,
        -wo_hat[..., None, :], p_axis_in[..., None, :],
        mu.stokes_basis(-wo_hat)[..., None, :],
        wi_hat[..., None, :], p_axis_out[..., None, :],
        mu.stokes_basis(wi_hat)[..., None, :],
    )
    return jnp.nan_to_num(out)


@struct.dataclass
class IsotropicPhase:
    """(reference: src/phase/isotropic.cpp)."""

    def sample(self, mei, u1, u2, wavelengths, n_channels):
        wo = warp.square_to_uniform_sphere(u2)
        pdf = jnp.full(wo.shape[:-1], INV_FOUR_PI, jnp.float32)
        weight = jnp.ones(wo.shape[:-1] + (n_channels,), jnp.float32)
        return wo, weight, pdf

    def eval_pdf(self, mei, wo, wavelengths, n_channels):
        pdf = jnp.full(wo.shape[:-1], INV_FOUR_PI, jnp.float32)
        return jnp.broadcast_to(pdf[..., None], pdf.shape + (n_channels,)), pdf


@struct.dataclass
class HGPhase:
    """Henyey-Greenstein (reference: src/phase/hg.cpp:75-105).
    g > 0 is forward scattering: pdf peaks at wo with dot(wi,wo) = -1,
    i.e. wo continuing along the propagation direction (+z local)."""

    g: jnp.ndarray

    def sample(self, mei, u1, u2, wavelengths, n_channels):
        wo = warp.square_to_hg(u2, self.g)
        pdf = warp.square_to_hg_pdf(wo, self.g)
        weight = jnp.ones(wo.shape[:-1] + (n_channels,), jnp.float32)
        return wo, weight, pdf

    def eval_pdf(self, mei, wo, wavelengths, n_channels):
        pdf = warp.square_to_hg_pdf(wo, self.g)
        return jnp.broadcast_to(pdf[..., None], pdf.shape + (n_channels,)), pdf


@struct.dataclass
class RayleighPhase:
    """Rayleigh scattering with depolarization factor rho
    (reference: src/phase/rayleigh.cpp:42-48).  Unpolarized path: scalar
    phase value; polarized Mueller weight via mueller.rayleigh_scatter is
    applied by the polarized integrators."""

    rho: jnp.ndarray

    def _phase_value(self, cos_theta):
        # normalized rho-dependent scalar phase (M00 of rayleigh_scatter):
        # 3/(16 pi) r1 (r2 + cos^2); integrates to 1 over the sphere.
        rho = self.rho
        r1 = (1.0 - rho) / (1.0 + rho / 2.0)
        r2 = (1.0 + rho) / (1.0 - rho)
        return (3.0 / (16.0 * jnp.pi)) * r1 * (r2 + cos_theta * cos_theta)

    def sample(self, mei, u1, u2, wavelengths, n_channels):
        # sample the rho=0 shape as a proposal; exact for rho=0, and we return
        # weight = phase/pdf for rho != 0
        wo = warp.square_to_rayleigh(u2)
        pdf = warp.square_to_rayleigh_pdf(wo)
        # phase is symmetric in cos(theta); sign convention irrelevant here
        val = self._phase_value(wo[..., 2])
        w = (val / jnp.maximum(pdf, 1e-12))[..., None]
        weight = jnp.broadcast_to(w, w.shape[:-1] + (n_channels,))
        return wo, weight, pdf

    def eval_pdf(self, mei, wo, wavelengths, n_channels):
        cos_theta = wo[..., 2]
        val = self._phase_value(cos_theta)
        pdf = warp.square_to_rayleigh_pdf(wo)
        return jnp.broadcast_to(val[..., None], val.shape + (n_channels,)), pdf

    def eval_pdf_mueller(self, mei, wo, wavelengths, n_channels):
        """Polarized Rayleigh: full Mueller matrix in local implicit bases
        (reference: src/phase/rayleigh.cpp:42-48 + mueller::rayleigh_scatter,
        mueller.h:311-328).  Physics convention: cos_theta = -dot(wo, wi),
        wi = (0,0,-1) local => cos_theta = wo_z."""
        cos_theta = wo[..., 2]
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
        M = mu.rayleigh_scatter(cos_theta, sin_theta, self.rho)  # [N,4,4]
        M = jnp.broadcast_to(M[..., None, :, :], M.shape[:-2] + (n_channels, 4, 4))
        wi_hat = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0], jnp.float32), wo.shape
        )
        M = rotate_phase_mueller(M, wo, wi_hat)
        pdf = warp.square_to_rayleigh_pdf(wo)
        return M, pdf


def sggx_ndf_pdf(wm, s6):
    """SGGX normal distribution D(wm) (reference:
    include/mitsuba/render/microflake.h sggx_pdf).  wm: [N,3] (any orthonormal
    basis, consistent with s6); s6: [N,6] = [Sxx,Syy,Szz,Sxy,Sxz,Syz]."""
    xx, yy, zz, xy, xz, yz = [s6[..., i] for i in range(6)]
    det_s = jnp.abs(
        xx * yy * zz - xx * yz * yz - yy * xz * xz - zz * xy * xy
        + 2.0 * xy * xz * yz
    )
    wx, wy, wz = wm[..., 0], wm[..., 1], wm[..., 2]
    den = (
        wx * wx * (yy * zz - yz * yz)
        + wy * wy * (xx * zz - xz * xz)
        + wz * wz * (xx * yy - xy * xy)
        + 2.0 * (
            wx * wy * (xz * yz - zz * xy)
            + wx * wz * (xy * yz - yy * xz)
            + wy * wz * (xy * xz - xx * yz)
        )
    )
    return det_s * jnp.sqrt(det_s) / (jnp.pi * jnp.maximum(den, 1e-20) ** 2)


def sggx_projected_area(wi, s6):
    """sigma(wi) = sqrt(wi^T S wi) (microflake.h sggx_projected_area)."""
    wx, wy, wz = wi[..., 0], wi[..., 1], wi[..., 2]
    sigma2 = (
        wx * wx * s6[..., 0] + wy * wy * s6[..., 1] + wz * wz * s6[..., 2]
        + 2.0 * (
            wx * wy * s6[..., 3] + wx * wz * s6[..., 4] + wy * wz * s6[..., 5]
        )
    )
    return jnp.sqrt(jnp.maximum(sigma2, 0.0))


def _sggx_quad(u, v, s6):
    """u^T S v for the symmetric S packed as s6."""
    xx, yy, zz, xy, xz, yz = [s6[..., i] for i in range(6)]
    sv0 = xx * v[..., 0] + xy * v[..., 1] + xz * v[..., 2]
    sv1 = xy * v[..., 0] + yy * v[..., 1] + yz * v[..., 2]
    sv2 = xz * v[..., 0] + yz * v[..., 1] + zz * v[..., 2]
    return u[..., 0] * sv0 + u[..., 1] * sv1 + u[..., 2] * sv2


def sggx_sample_normal(wi, u2, s6):
    """Sample the SGGX visible-normal distribution (microflake.h
    sggx_sample), world coordinates.  wi: [N,3] incident direction (toward
    the origin of the incoming ray); returns wm [N,3]."""
    x_a, y_a = coordinate_system(wi)
    # S projected into the (x', y', z'=wi) frame; indices (k,j,i)=(x,y,z)
    s_kk = _sggx_quad(x_a, x_a, s6)
    s_jj = _sggx_quad(y_a, y_a, s6)
    s_ii = _sggx_quad(wi, wi, s6)
    s_kj = _sggx_quad(x_a, y_a, s6)
    s_ki = _sggx_quad(x_a, wi, s6)
    s_ji = _sggx_quad(y_a, wi, s6)

    xx, yy, zz, xy, xz, yz = [s6[..., i] for i in range(6)]
    det_s = jnp.abs(
        xx * yy * zz - xx * yz * yz - yy * xz * xz - zz * xy * xy
        + 2.0 * xy * xz * yz
    )
    inv_sqrt_s_ii = jax.lax.rsqrt(jnp.maximum(s_ii, 1e-20))
    tmp = jnp.sqrt(jnp.maximum(s_jj * s_ii - s_ji * s_ji, 1e-20))
    m_k_x = jnp.sqrt(det_s) / tmp
    m_j_x = -inv_sqrt_s_ii * (s_ki * s_ji - s_kj * s_ii) / tmp
    m_j_y = inv_sqrt_s_ii * tmp
    # m_i = inv_sqrt_s_ii * (s_ki, s_ji, s_ii)
    uvw = warp.square_to_cosine_hemisphere(u2)
    u, v, w = uvw[..., 0], uvw[..., 1], uvw[..., 2]
    n_x = u * m_k_x + v * m_j_x + w * inv_sqrt_s_ii * s_ki
    n_y = v * m_j_y + w * inv_sqrt_s_ii * s_ji
    n_z = w * inv_sqrt_s_ii * s_ii
    wm = (
        n_x[..., None] * x_a + n_y[..., None] * y_a + n_z[..., None] * wi
    )
    return normalize(wm)


@struct.dataclass
class SGGXPhase:
    """SGGX microflake phase function (reference: src/phase/sggx.cpp,
    include/mitsuba/render/microflake.h; Heitz et al. 2015).  Specular
    microflakes: sample a visible normal, mirror-reflect; the phase value
    equals its pdf (perfect importance sampling, sggx.cpp:108-135).  The
    medium's sigma_t is scaled by the projected area sigma(wi) at each
    collision (reference: homogeneous.cpp:158-159, heterogeneous.cpp:193-194
    — wired through Scene.medium_coefficients)."""

    S: object     # 6-channel volume: [Sxx, Syy, Szz, Sxy, Sxz, Syz]
    is_microflake = True

    def _s6(self, mei):
        return self.S.eval(mei.p, 6)

    def _wi_world(self, mei):
        # local wi = (0,0,-1), frame n = ray.d  =>  world wi = -ray.d
        return -mei.sh_n

    def projected_area(self, mei):
        return sggx_projected_area(self._wi_world(mei), self._s6(mei))

    def sample(self, mei, u1, u2, wavelengths, n_channels):
        s6 = self._s6(mei)
        wi = self._wi_world(mei)
        wm = sggx_sample_normal(wi, u2, s6)
        pa = jnp.maximum(sggx_projected_area(wi, s6), 1e-12)
        pdf = 0.25 * sggx_ndf_pdf(wm, s6) / pa
        wo_w = 2.0 * jnp.sum(wi * wm, axis=-1, keepdims=True) * wm - wi
        wo = mei.to_local(normalize(wo_w))
        weight = jnp.ones(wo.shape[:-1] + (n_channels,), jnp.float32)
        return wo, weight, pdf

    def eval_pdf(self, mei, wo, wavelengths, n_channels):
        s6 = self._s6(mei)
        wi = self._wi_world(mei)
        wo_w = mei.to_world(wo)
        h = normalize(wo_w + wi)
        pa = jnp.maximum(sggx_projected_area(wi, s6), 1e-12)
        pdf = 0.25 * sggx_ndf_pdf(h, s6) / pa
        # degenerate half-vector (wo == -wi): density 0
        pdf = jnp.where(
            jnp.sum((wo_w + wi) ** 2, axis=-1) < 1e-12, 0.0, pdf
        )
        return jnp.broadcast_to(pdf[..., None], pdf.shape + (n_channels,)), pdf


@struct.dataclass
class TabulatedPhase:
    """Tabulated scalar phase function over cos(theta)
    (reference: src/phase/tabphase.cpp).  `nodes`/`values` define a linearly
    interpolated density on [-1, 1] with cos(theta) = dot(wi, wo) = -wo_z;
    sampled by inverse CDF; values are differentiable scene parameters."""

    nodes: jnp.ndarray     # [K] cos(theta) grid, increasing
    values: jnp.ndarray    # [K] unnormalized phase values

    def _distr(self):
        from ..core.distr import IrregularContinuousDistribution

        return IrregularContinuousDistribution.create(self.nodes, self.values)

    def sample(self, mei, u1, u2, wavelengths, n_channels):
        d = self._distr()
        cos_theta = d.sample(u2[..., 1])
        # pdf over solid angle = pdf(cos)/2pi
        pdf = d.eval_pdf_normalized(cos_theta) / (2.0 * jnp.pi)
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
        phi = 2.0 * jnp.pi * u2[..., 0]
        # direction with dot(wi, wo) = cos_theta, wi = (0,0,-1) => wo_z = -cos_theta
        wo = jnp.stack(
            [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), -cos_theta], axis=-1
        )
        weight = jnp.ones(wo.shape[:-1] + (n_channels,), jnp.float32)
        return wo, weight, pdf

    def eval_pdf(self, mei, wo, wavelengths, n_channels):
        d = self._distr()
        cos_theta = -wo[..., 2]
        pdf = d.eval_pdf_normalized(cos_theta) / (2.0 * jnp.pi)
        return jnp.broadcast_to(pdf[..., None], pdf.shape + (n_channels,)), pdf

    def parameters_changed(self):
        return self
