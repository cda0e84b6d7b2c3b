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

import jax.numpy as jnp
from flax import struct

from ..core import warp
from ..core.math import INV_FOUR_PI
from ..core.frame import cross, normalize
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
