"""BSDF plugins (reference: src/bsdfs/*, include/mitsuba/render/bsdf.h).

Semantics mirror the reference exactly:
  * eval(si, wo) returns f(wi, wo) * |cos_theta_o|   (bsdf.h eval docs)
  * sample(...) returns (BSDFSample, weight) with weight = eval/pdf
  * delta (specular) lobes have eval = pdf = 0; their sampled weight carries
    the full Fresnel factor (reference: src/bsdfs/dielectric.cpp).

Dispatch: the integrator loops over the (static, small) list of BSDF instances
in the scene and evaluates each on all lanes under a shape-index mask — the
wavefront equivalent of Dr.Jit's vectorized vcalls
(reference: DRJIT_VCALL_* in include/mitsuba/render/bsdf.h).

In polarized variants, eval_mueller/sample return [N, C, 4, 4] Mueller weights
in the local frame with the reference's convention (matrix operates from the
implicit Stokes basis of -wo_world to that of -wi_world... handled by the
integrator's to_world_mueller rotation).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import warp
from ..core.frame import coordinate_system, cross, normalize, reflect
from ..core.math import INV_PI
from . import microfacet as mf
from . import mueller as mu
from .fresnel import fresnel, fresnel_conductor
from .records import BSDFSample
from .textures import tex_eval


def rotate_specular_mueller(M, wo_hat, wi_hat):
    """Rotate a specular Mueller matrix whose reference vector lies
    *perpendicular* to the plane of reflection (s-axis) into the implicit
    local Stokes bases (reference: src/bsdfs/dielectric.cpp:296-340).
    Light arrives along -wo_hat and leaves along +wi_hat (local frame).
    M: [N, C, 4, 4]."""
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    s_axis_in = cross(jnp.broadcast_to(n, wo_hat.shape), -wo_hat)
    s_axis_out = cross(jnp.broadcast_to(n, wi_hat.shape), wi_hat)
    collinear = jnp.sum(s_axis_in * s_axis_in, axis=-1, keepdims=True) < 1e-16
    fallback = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), wo_hat.shape)
    s_axis_in = jnp.where(collinear, fallback, normalize(jnp.where(collinear, fallback, s_axis_in)))
    s_axis_out = jnp.where(collinear, fallback, normalize(jnp.where(collinear, fallback, s_axis_out)))
    return mu.rotate_mueller_basis(
        M,
        -wo_hat[..., None, :], s_axis_in[..., None, :],
        mu.stokes_basis(-wo_hat)[..., None, :],
        wi_hat[..., None, :], s_axis_out[..., None, :],
        mu.stokes_basis(wi_hat)[..., None, :],
    )


def _invalid_sample(n):
    return BSDFSample(
        wo=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 1)),
        pdf=jnp.zeros((n,), jnp.float32),
        eta=jnp.ones((n,), jnp.float32),
        delta=jnp.zeros((n,), bool),
    )


@struct.dataclass
class DiffuseBSDF:
    """Smooth Lambertian (reference: src/bsdfs/diffuse.cpp)."""

    reflectance: object   # texture

    flags_smooth = True
    flags_transmission = False

    def eval(self, si, wo, wavelengths, n_channels):
        cos_i = si.wi[..., 2]
        cos_o = wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        refl = tex_eval(self.reflectance, si, wavelengths, n_channels)
        val = refl * (INV_PI * jnp.maximum(cos_o, 0.0))[..., None]
        return jnp.where(valid[..., None], val, 0.0)

    def pdf(self, si, wo):
        valid = (si.wi[..., 2] > 0) & (wo[..., 2] > 0)
        return jnp.where(valid, warp.square_to_cosine_hemisphere_pdf(wo), 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        wo = warp.square_to_cosine_hemisphere(u2)
        pdf = warp.square_to_cosine_hemisphere_pdf(wo)
        valid = si.wi[..., 2] > 0
        refl = tex_eval(self.reflectance, si, wavelengths, n_channels)
        weight = jnp.where(valid[..., None], refl, 0.0)
        bs = BSDFSample(
            wo=wo,
            pdf=jnp.where(valid, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            delta=jnp.zeros_like(valid) & False,
        )
        return bs, weight


@struct.dataclass
class NullBSDF:
    """Perfect transmitter used for medium boundaries
    (reference: src/bsdfs/null.cpp)."""

    flags_smooth = False
    flags_transmission = True

    def eval(self, si, wo, wavelengths, n_channels):
        return jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

    def pdf(self, si, wo):
        return jnp.zeros(wo.shape[:-1], jnp.float32)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        n = si.wi.shape[0]
        bs = BSDFSample(
            wo=-si.wi,
            pdf=jnp.ones((n,), jnp.float32),
            eta=jnp.ones((n,), jnp.float32),
            delta=jnp.ones((n,), bool),
        )
        return bs, jnp.ones((n, n_channels), jnp.float32)


@struct.dataclass
class SmoothDielectricBSDF:
    """Smooth dielectric with Fresnel-weighted reflect/refract Dirac lobes
    (reference: src/bsdfs/dielectric.cpp)."""

    eta: jnp.ndarray          # scalar relative IOR int/ext
    specular_reflectance: object
    specular_transmittance: object

    flags_smooth = False
    flags_transmission = True

    def eval(self, si, wo, wavelengths, n_channels):
        return jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

    def pdf(self, si, wo):
        return jnp.zeros(wo.shape[:-1], jnp.float32)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        cos_i = si.wi[..., 2]
        f, cos_theta_t, eta_it, eta_ti = fresnel(cos_i, self.eta)
        pick_reflect = u_lobe <= f
        wo_r = reflect(si.wi)
        wo_t = jnp.stack(
            [-eta_ti * si.wi[..., 0], -eta_ti * si.wi[..., 1], cos_theta_t], axis=-1
        )
        wo = jnp.where(pick_reflect[..., None], wo_r, wo_t)
        pdf = jnp.where(pick_reflect, f, 1.0 - f)
        refl = tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        trans = tex_eval(self.specular_transmittance, si, wavelengths, n_channels)
        # radiance scaling on refraction: 1/eta_it^2 (solid-angle compression)
        factor_t = eta_ti * eta_ti
        weight = jnp.where(
            pick_reflect[..., None], refl, trans * factor_t[..., None]
        )
        bs = BSDFSample(
            wo=wo,
            pdf=pdf,
            eta=jnp.where(pick_reflect, 1.0, eta_it),
            delta=jnp.ones_like(pick_reflect),
        )
        return bs, weight

    def sample_pol(self, u_lobe, u2, si, wavelengths, n_channels):
        """Polarized sample: full Fresnel Mueller weight in local implicit
        bases (reference: dielectric.cpp:296-340).  Radiance transport:
        light arrives along -wo_hat (= -bs.wo) and leaves along wi_hat = si.wi."""
        bs, _ = self.sample(u_lobe, u2, si, wavelengths, n_channels)
        wo_hat = bs.wo
        wi_hat = si.wi
        cos_o = wo_hat[..., 2]
        R = mu.specular_reflection(cos_o[..., None], jnp.asarray(self.eta, jnp.complex64))
        T = mu.specular_transmission(cos_o[..., None], self.eta)
        pick_reflect = bs.eta == 1.0
        M = jnp.where(pick_reflect[..., None, None, None], R, T)
        M = jnp.broadcast_to(M, M.shape[:-3] + (n_channels, 4, 4))
        M = M / jnp.maximum(bs.pdf, 1e-8)[..., None, None, None]
        M = rotate_specular_mueller(M, wo_hat, wi_hat)
        refl = tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        trans = tex_eval(self.specular_transmittance, si, wavelengths, n_channels)
        scalar = jnp.where(pick_reflect[..., None], refl, trans)
        return bs, M * scalar[..., None, None]


@struct.dataclass
class ThinDielectricBSDF:
    """Two-interface thin dielectric slab (reference: src/bsdfs/thindielectric.cpp)."""

    eta: jnp.ndarray
    specular_reflectance: object
    specular_transmittance: object

    flags_smooth = False
    flags_transmission = True

    def eval(self, si, wo, wavelengths, n_channels):
        return jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

    def pdf(self, si, wo):
        return jnp.zeros(wo.shape[:-1], jnp.float32)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        cos_i = si.wi[..., 2]
        f, _, _, _ = fresnel(jnp.abs(cos_i), self.eta)
        # account for internal bounces: R' = R + TRT/(1-R^2) = 2R/(1+R)
        f = jnp.where(f < 1.0, 2.0 * f / (1.0 + f), 1.0)
        pick_reflect = u_lobe <= f
        wo = jnp.where(pick_reflect[..., None], reflect(si.wi), -si.wi)
        pdf = jnp.where(pick_reflect, f, 1.0 - f)
        refl = tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        trans = tex_eval(self.specular_transmittance, si, wavelengths, n_channels)
        weight = jnp.where(pick_reflect[..., None], refl, trans)
        bs = BSDFSample(
            wo=wo, pdf=pdf, eta=jnp.ones_like(pdf), delta=jnp.ones_like(pick_reflect)
        )
        return bs, weight


@struct.dataclass
class SmoothConductorBSDF:
    """Smooth conductor, Dirac mirror with complex-IOR Fresnel
    (reference: src/bsdfs/conductor.cpp)."""

    eta: jnp.ndarray          # [C] or scalar: real part of IOR
    k: jnp.ndarray            # [C] or scalar: extinction
    specular_reflectance: object

    flags_smooth = False
    flags_transmission = False

    def eval(self, si, wo, wavelengths, n_channels):
        return jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

    def pdf(self, si, wo):
        return jnp.zeros(wo.shape[:-1], jnp.float32)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        cos_i = si.wi[..., 2]
        valid = cos_i > 0
        f = fresnel_conductor(cos_i[..., None], self.eta, self.k)
        f = jnp.broadcast_to(f, f.shape[:-1] + (n_channels,))
        refl = tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        weight = jnp.where(valid[..., None], f * refl, 0.0)
        bs = BSDFSample(
            wo=reflect(si.wi),
            pdf=jnp.where(valid, 1.0, 0.0),
            eta=jnp.ones_like(cos_i),
            delta=jnp.ones_like(valid),
        )
        return bs, weight

    def sample_pol(self, u_lobe, u2, si, wavelengths, n_channels):
        """Polarized conductor mirror: complex-IOR Fresnel Mueller matrix
        (reference: src/bsdfs/conductor.cpp:273-282)."""
        bs, _ = self.sample(u_lobe, u2, si, wavelengths, n_channels)
        wo_hat = bs.wo
        wi_hat = si.wi
        cos_o = wo_hat[..., 2]
        eta_c = jnp.asarray(self.eta, jnp.complex64) - 1j * jnp.asarray(self.k, jnp.complex64)
        R = mu.specular_reflection(cos_o[..., None], eta_c)       # [N, C?, 4, 4]
        R = jnp.broadcast_to(R, R.shape[:-3] + (n_channels, 4, 4))
        R = rotate_specular_mueller(R, wo_hat, wi_hat)
        valid = si.wi[..., 2] > 0
        refl = tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        M = jnp.where(valid[..., None, None, None], R * refl[..., None, None], 0.0)
        return bs, M


@struct.dataclass
class RoughConductorBSDF:
    """GGX microfacet conductor with VNDF sampling
    (reference: src/bsdfs/roughconductor.cpp)."""

    eta: jnp.ndarray
    k: jnp.ndarray
    alpha_u: jnp.ndarray
    alpha_v: jnp.ndarray
    specular_reflectance: object

    flags_smooth = True
    flags_transmission = False

    @staticmethod
    def _half(wi, wo, valid):
        """NaN-safe half vector: masked lanes (where wi + wo can vanish,
        e.g. wo == -wi) evaluate at +z so the normalize never divides by ~0
        — a bare where() would still leak NaN through the vjp of the
        unselected branch (the where-where pattern)."""
        hsum = jnp.where(
            valid[..., None], wi + wo,
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], wi.dtype), wi.shape),
        )
        return normalize(hsum)

    def _f(self, si, wo, wavelengths, n_channels):
        cos_i = si.wi[..., 2]
        cos_o = wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        h = self._half(si.wi, wo, valid)
        d = mf.ggx_d(h, self.alpha_u, self.alpha_v)
        g = mf.ggx_g(si.wi, wo, h, self.alpha_u, self.alpha_v)
        f = fresnel_conductor(
            jnp.sum(si.wi * h, axis=-1)[..., None], self.eta, self.k
        )
        f = jnp.broadcast_to(f, f.shape[:-1] + (n_channels,))
        spec = (d * g / jnp.maximum(4.0 * cos_i, 1e-9))[..., None] * f
        return jnp.where(valid[..., None], spec, 0.0), h, valid

    def eval(self, si, wo, wavelengths, n_channels):
        # f*cos_o = [D G F / (4 cos_i cos_o)] * cos_o = D G F / (4 cos_i)
        refl = tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        val, _, _ = self._f(si, wo, wavelengths, n_channels)
        return val * refl

    def pdf(self, si, wo):
        valid = (si.wi[..., 2] > 0) & (wo[..., 2] > 0)
        h = self._half(si.wi, wo, valid)
        pdf_h = mf.ggx_pdf_visible(si.wi, h, self.alpha_u, self.alpha_v)
        jac = 1.0 / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, axis=-1)), 1e-9)
        return jnp.where(valid, pdf_h * jac, 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        m = mf.ggx_sample_vndf(si.wi, u2[..., 0], u2[..., 1], self.alpha_u, self.alpha_v)
        wo = 2.0 * jnp.sum(si.wi * m, axis=-1, keepdims=True) * m - si.wi
        pdf = self.pdf(si, wo)
        val = self.eval(si, wo, wavelengths, n_channels)
        weight = jnp.where(
            (pdf > 0)[..., None], val / jnp.maximum(pdf, 1e-20)[..., None], 0.0
        )
        bs = BSDFSample(
            wo=wo,
            pdf=pdf,
            eta=jnp.ones_like(pdf),
            delta=jnp.zeros(pdf.shape, bool),
        )
        return bs, weight


@struct.dataclass
class RoughDielectricBSDF:
    """GGX rough dielectric with reflection + transmission (Walter et al.
    2007; reference: src/bsdfs/roughdielectric.cpp:251-560).  This is the
    AOS ocean-interface BSDF (reference: test_ad_volpathaos.py configs).
    Standard Smith G = G1*G1 is used in eval (the fork sets G=1 there,
    roughdielectric.cpp:467 — we keep the self-consistent form so that
    sample weight == eval/pdf)."""

    eta: jnp.ndarray
    alpha: jnp.ndarray
    specular_reflectance: object
    specular_transmittance: object

    flags_smooth = True
    flags_transmission = True
    is_refractive_interface = True

    def _half_vector(self, wi, wo, reflect_mask):
        eta = jnp.where(wi[..., 2] > 0, self.eta, 1.0 / self.eta)
        m = normalize(wi + wo * jnp.where(reflect_mask, 1.0, eta)[..., None])
        return jnp.where(m[..., 2:3] < 0, -m, m), eta

    def eval(self, si, wo, wavelengths, n_channels):
        wi = si.wi
        cos_i = wi[..., 2]
        cos_o = wo[..., 2]
        reflect_m = cos_i * cos_o > 0
        m, eta = self._half_vector(wi, wo, reflect_m)
        inv_eta = 1.0 / eta
        valid = (
            (jnp.abs(cos_i) > 1e-6)
            & (jnp.sum(wi * m, axis=-1) * cos_i > 0)
            & (jnp.sum(wo * m, axis=-1) * cos_o > 0)
        )
        d = mf.ggx_d(m, self.alpha, self.alpha)
        g = mf.smith_g1_ggx(jnp.where(cos_i[..., None] > 0, wi, -wi), m, self.alpha, self.alpha) * \
            mf.smith_g1_ggx(jnp.where(cos_o[..., None] > 0, wo, -wo), m, self.alpha, self.alpha)
        f, _, _, _ = fresnel(jnp.sum(wi * m, axis=-1), self.eta)

        # reflection: F D G / (4 |cos_i|)
        val_r = f * d * g / (4.0 * jnp.abs(cos_i))
        # transmission (Walter eq. 21 + radiance scale 1/eta^2)
        wim = jnp.sum(wi * m, axis=-1)
        wom = jnp.sum(wo * m, axis=-1)
        denom = (wim + eta * wom) ** 2
        val_t = jnp.abs(
            (inv_eta**2) * (1.0 - f) * d * g * eta * eta * wim * wom
            / (cos_i * jnp.maximum(denom, 1e-12))
        )
        val = jnp.where(reflect_m, val_r, val_t)
        val = jnp.where(valid, val, 0.0)
        refl = tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        trans = tex_eval(self.specular_transmittance, si, wavelengths, n_channels)
        scalar = jnp.where(reflect_m[..., None], refl, trans)
        return val[..., None] * scalar

    def pdf(self, si, wo):
        wi = si.wi
        cos_i = wi[..., 2]
        cos_o = wo[..., 2]
        reflect_m = cos_i * cos_o > 0
        m, eta = self._half_vector(wi, wo, reflect_m)
        valid = (
            (jnp.abs(cos_i) > 1e-6)
            & (jnp.sum(wi * m, axis=-1) * cos_i > 0)
            & (jnp.sum(wo * m, axis=-1) * cos_o > 0)
        )
        wim = jnp.sum(wi * m, axis=-1)
        wom = jnp.sum(wo * m, axis=-1)
        dwh_dwo = jnp.where(
            reflect_m,
            1.0 / jnp.maximum(4.0 * jnp.abs(wom), 1e-12),
            (eta * eta * jnp.abs(wom)) / jnp.maximum((wim + eta * wom) ** 2, 1e-12),
        )
        wi_up = jnp.where(cos_i[..., None] > 0, wi, -wi)
        pdf_m = mf.ggx_pdf_visible(wi_up, m, self.alpha, self.alpha)
        f, _, _, _ = fresnel(wim, self.eta)
        lobe = jnp.where(reflect_m, f, 1.0 - f)
        return jnp.where(valid, pdf_m * lobe * dwh_dwo, 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        wi = si.wi
        cos_i = wi[..., 2]
        wi_up = jnp.where(cos_i[..., None] > 0, wi, -wi)
        m = mf.ggx_sample_vndf(wi_up, u2[..., 0], u2[..., 1], self.alpha, self.alpha)
        m = jnp.where(cos_i[..., None] > 0, m, -m)   # align with wi hemisphere
        wim = jnp.sum(wi * m, axis=-1)
        f, cos_theta_t, eta_it, eta_ti = fresnel(wim, self.eta)
        pick_reflect = u_lobe <= f
        wo_r = 2.0 * wim[..., None] * m - wi
        # refract about m (fresnel.h refract w.r.t. arbitrary normal)
        wo_t = (eta_ti[..., None]) * (-wi) + (
            eta_ti * wim + cos_theta_t
        )[..., None] * m
        wo = jnp.where(pick_reflect[..., None], wo_r, wo_t)
        # filter micro/macro hemisphere disagreement with the *sampled* m
        # (reference: roughdielectric.cpp:330-333) — e.g. reflections off
        # grazing microfacets that point below the macro horizon; without
        # this the pdf misclassifies them as transmission
        wom_s = jnp.sum(wo * m, axis=-1)
        agree = (wim * cos_i > 0) & (wom_s * wo[..., 2] > 0)
        pdf = jnp.where(agree, self.pdf(si, wo), 0.0)
        val = self.eval(si, wo, wavelengths, n_channels)
        weight = jnp.where(
            (agree & (pdf > 1e-10))[..., None],
            val / jnp.maximum(pdf, 1e-10)[..., None],
            0.0,
        )
        bs = BSDFSample(
            wo=wo,
            pdf=pdf,
            eta=jnp.where(pick_reflect, 1.0, eta_it),
            delta=jnp.zeros(pdf.shape, bool),
        )
        return bs, weight

    def sample_pol(self, u_lobe, u2, si, wavelengths, n_channels):
        """Polarized sample: Mueller weight = eval_mueller / pdf at the
        sampled direction (keeps sampled specular bounces polarized)."""
        bs, _ = self.sample(u_lobe, u2, si, wavelengths, n_channels)
        M, pdf = self.eval_pdf_mueller(si, bs.wo, wavelengths, n_channels)
        Mw = jnp.where(
            (pdf > 1e-10)[..., None, None, None],
            M / jnp.maximum(pdf, 1e-10)[..., None, None, None],
            0.0,
        )
        return bs, Mw

    def sample_transmission(self, u2, wi):
        """Sample only the transmission lobe — the AOS refractive-NEE proposal
        (reference: volpathaos.cpp:318-337, ctx.type_mask = Glossy|Delta
        Transmission).  Returns (wo, pdf) with pdf excluding the Fresnel lobe
        factor (single-lobe context)."""
        cos_i = wi[..., 2]
        wi_up = jnp.where(cos_i[..., None] > 0, wi, -wi)
        m = mf.ggx_sample_vndf(wi_up, u2[..., 0], u2[..., 1], self.alpha, self.alpha)
        m = jnp.where(cos_i[..., None] > 0, m, -m)
        wim = jnp.sum(wi * m, axis=-1)
        f, cos_theta_t, eta_it, eta_ti = fresnel(wim, self.eta)
        wo = (eta_ti[..., None]) * (-wi) + (eta_ti * wim + cos_theta_t)[..., None] * m
        wom = jnp.sum(wo * m, axis=-1)
        eta = jnp.where(cos_i > 0, self.eta, 1.0 / self.eta)
        dwh_dwo = (eta * eta * jnp.abs(wom)) / jnp.maximum((wim + eta * wom) ** 2, 1e-12)
        pdf_m = mf.ggx_pdf_visible(wi_up, jnp.where(cos_i[..., None] > 0, m, -m), self.alpha, self.alpha)
        tir = cos_theta_t == 0.0
        pdf = jnp.where(tir, 0.0, pdf_m * dwh_dwo)
        return wo, pdf

    def eval_pdf_mueller(self, si, wo, wavelengths, n_channels):
        """Polarized eval: Fresnel Mueller around the microfacet normal
        (reference: roughdielectric.cpp:472-505), scaled by the scalar
        D G / ... magnitude with the Fresnel factor divided back out."""
        wi = si.wi
        cos_i = wi[..., 2]
        cos_o = wo[..., 2]
        reflect_m = cos_i * cos_o > 0
        m, _ = self._half_vector(wi, wo, reflect_m)
        val = self.eval(si, wo, wavelengths, n_channels)   # [N, C]
        pdf = self.pdf(si, wo)
        wo_hat = wo
        wi_hat = wi
        cos_o_hat = jnp.sum(wo_hat * m, axis=-1)
        R = mu.specular_reflection(cos_o_hat[..., None], jnp.asarray(self.eta, jnp.complex64))
        T = mu.specular_transmission(cos_o_hat[..., None], self.eta)
        M = jnp.where(reflect_m[..., None, None, None], R, T)
        M = jnp.broadcast_to(M, M.shape[:-3] + (n_channels, 4, 4))
        # normalize so M00 == 1, then scale by the unpolarized magnitude
        m00 = M[..., 0:1, 0:1]
        M = jnp.where(jnp.abs(m00) > 1e-12, M / jnp.where(jnp.abs(m00) > 1e-12, m00, 1.0), 0.0)
        M = rotate_specular_mueller_m(M, wo_hat, wi_hat, m)
        M = M * val[..., None, None]
        return jnp.nan_to_num(M), pdf


def rotate_specular_mueller_m(M, wo_hat, wi_hat, m_normal):
    """Like rotate_specular_mueller but with the s-axis built from the
    microfacet normal m (reference: roughdielectric.cpp:491-499)."""
    s_axis_in = cross(m_normal, -wo_hat)
    s_axis_out = cross(m_normal, wi_hat)
    collinear = jnp.sum(s_axis_in * s_axis_in, axis=-1, keepdims=True) < 1e-16
    fallback = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), wo_hat.shape)
    s_axis_in = jnp.where(collinear, fallback, normalize(jnp.where(collinear, fallback, s_axis_in)))
    s_axis_out = jnp.where(collinear, fallback, normalize(jnp.where(collinear, fallback, s_axis_out)))
    return mu.rotate_mueller_basis(
        M,
        -wo_hat[..., None, :], s_axis_in[..., None, :],
        mu.stokes_basis(-wo_hat)[..., None, :],
        wi_hat[..., None, :], s_axis_out[..., None, :],
        mu.stokes_basis(wi_hat)[..., None, :],
    )


@struct.dataclass
class TwoSidedBSDF:
    """Two-sided adapter: flips the frame for backside hits
    (reference: src/bsdfs/twosided.cpp)."""

    nested: object

    @property
    def flags_smooth(self):
        return self.nested.flags_smooth

    flags_transmission = False

    def _flip(self, si):
        flip = si.wi[..., 2] < 0
        wi = jnp.where(flip[..., None], si.wi * jnp.asarray([1.0, 1.0, -1.0]), si.wi)
        return si.replace(wi=wi), flip

    def eval(self, si, wo, wavelengths, n_channels):
        si2, flip = self._flip(si)
        wo2 = jnp.where(flip[..., None], wo * jnp.asarray([1.0, 1.0, -1.0]), wo)
        return self.nested.eval(si2, wo2, wavelengths, n_channels)

    def pdf(self, si, wo):
        si2, flip = self._flip(si)
        wo2 = jnp.where(flip[..., None], wo * jnp.asarray([1.0, 1.0, -1.0]), wo)
        return self.nested.pdf(si2, wo2)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        si2, flip = self._flip(si)
        bs, weight = self.nested.sample(u_lobe, u2, si2, wavelengths, n_channels)
        wo = jnp.where(flip[..., None], bs.wo * jnp.asarray([1.0, 1.0, -1.0]), bs.wo)
        return bs.replace(wo=wo), weight


@struct.dataclass
class NormalmapBSDF:
    """Tangent-space normal-map modifier over a nested BSDF
    (reference: src/bsdfs/normalmap.cpp): the shading frame is replaced by
    the texture normal (decoded from [0,1]^3), and the nested BSDF is
    evaluated in the perturbed frame."""

    nested: object
    normalmap: object     # texture storing (n+1)/2 in rgb

    flags_smooth = True
    flags_transmission = False

    def _perturbed_frame(self, si):
        # decode tangent-space normal; n_channels=3 fetch regardless of mode
        enc = tex_eval(self.normalmap, si, None, 3)
        n = normalize(2.0 * enc - 1.0)
        s, t = coordinate_system(n)
        return n, s, t

    def _to_p(self, si, v):
        n, s, t = self._perturbed_frame(si)
        return jnp.stack(
            [jnp.sum(v * s, -1), jnp.sum(v * t, -1), jnp.sum(v * n, -1)], -1
        )

    def _si_p(self, si):
        return si.replace(wi=self._to_p(si, si.wi))

    def eval(self, si, wo, wavelengths, n_channels):
        wo_p = self._to_p(si, wo)
        val = self.nested.eval(self._si_p(si), wo_p, wavelengths, n_channels)
        ok = (wo_p[..., 2] > 0) & (wo[..., 2] > 0)
        return jnp.where(ok[..., None], val, 0.0)

    def pdf(self, si, wo):
        wo_p = self._to_p(si, wo)
        p = self.nested.pdf(self._si_p(si), wo_p)
        return jnp.where((wo_p[..., 2] > 0) & (wo[..., 2] > 0), p, 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        n, s, t = self._perturbed_frame(si)
        si_p = self._si_p(si)
        bs, w = self.nested.sample(u_lobe, u2, si_p, wavelengths, n_channels)
        # perturbed local -> original local
        wo = bs.wo[..., 0:1] * s + bs.wo[..., 1:2] * t + bs.wo[..., 2:3] * n
        ok = wo[..., 2] > 0          # stay in the geometric hemisphere
        w = jnp.where(ok[..., None], w, 0.0)
        return bs.replace(wo=wo, pdf=jnp.where(ok, bs.pdf, 0.0)), w


@struct.dataclass
class MaskBSDF:
    """Opacity mask over a nested BSDF (reference: src/bsdfs/mask.cpp):
    with probability 1-opacity the ray passes straight through (null lobe)."""

    nested: object
    opacity: object   # texture

    flags_transmission = True

    @property
    def flags_smooth(self):
        return self.nested.flags_smooth

    def eval(self, si, wo, wavelengths, n_channels):
        op = tex_eval(self.opacity, si, wavelengths, n_channels)
        return self.nested.eval(si, wo, wavelengths, n_channels) * op

    def pdf(self, si, wo):
        op = jnp.mean(tex_eval(self.opacity, si, None, 1), axis=-1)
        return self.nested.pdf(si, wo) * op

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        op = tex_eval(self.opacity, si, wavelengths, n_channels)
        op_s = jnp.mean(op, axis=-1)
        pass_through = u_lobe >= op_s
        # rescale u_lobe for the nested lobe choice
        u_nested = jnp.clip(u_lobe / jnp.maximum(op_s, 1e-6), 0.0, 1.0)
        bs_n, w_n = self.nested.sample(u_nested, u2, si, wavelengths, n_channels)
        wo = jnp.where(pass_through[..., None], -si.wi, bs_n.wo)
        pdf = jnp.where(pass_through, 1.0 - op_s, bs_n.pdf * op_s)
        weight = jnp.where(pass_through[..., None], jnp.ones_like(w_n), w_n)
        bs = BSDFSample(
            wo=wo, pdf=pdf,
            eta=jnp.where(pass_through, 1.0, bs_n.eta),
            delta=jnp.where(pass_through, True, bs_n.delta),
        )
        return bs, weight


@struct.dataclass
class BlendBSDF:
    """Convex combination of two BSDFs by a weight texture
    (reference: src/bsdfs/blendbsdf.cpp)."""

    bsdf_a: object
    bsdf_b: object
    weight: object    # texture: weight of bsdf_b

    flags_smooth = True
    flags_transmission = False

    def _w(self, si):
        return jnp.mean(tex_eval(self.weight, si, None, 1), axis=-1)

    def eval(self, si, wo, wavelengths, n_channels):
        w = self._w(si)[..., None]
        return (
            (1 - w) * self.bsdf_a.eval(si, wo, wavelengths, n_channels)
            + w * self.bsdf_b.eval(si, wo, wavelengths, n_channels)
        )

    def pdf(self, si, wo):
        w = self._w(si)
        return (1 - w) * self.bsdf_a.pdf(si, wo) + w * self.bsdf_b.pdf(si, wo)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        w = self._w(si)
        pick_b = u_lobe < w
        u_a = jnp.clip((u_lobe - w) / jnp.maximum(1 - w, 1e-6), 0.0, 1.0)
        u_b = jnp.clip(u_lobe / jnp.maximum(w, 1e-6), 0.0, 1.0)
        bs_a, _ = self.bsdf_a.sample(u_a, u2, si, wavelengths, n_channels)
        bs_b, _ = self.bsdf_b.sample(u_b, u2, si, wavelengths, n_channels)
        wo = jnp.where(pick_b[..., None], bs_b.wo, bs_a.wo)
        pdf = self.pdf(si, wo)
        val = self.eval(si, wo, wavelengths, n_channels)
        weight = jnp.where(
            (pdf > 1e-10)[..., None], val / jnp.maximum(pdf, 1e-10)[..., None], 0.0
        )
        bs = BSDFSample(
            wo=wo, pdf=pdf, eta=jnp.ones_like(pdf), delta=jnp.zeros(pdf.shape, bool)
        )
        return bs, weight


@struct.dataclass
class PolarizerBSDF:
    """Ideal linear polarizer surface (reference: src/bsdfs/polarizer.cpp):
    transmits light, applying a rotated linear-polarizer Mueller matrix.
    Unpolarized variants see a 0.5 * transmittance attenuation."""

    theta: jnp.ndarray        # polarization axis angle (radians)
    transmittance: object

    flags_smooth = False
    flags_transmission = True

    def eval(self, si, wo, wavelengths, n_channels):
        return jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

    def pdf(self, si, wo):
        return jnp.zeros(wo.shape[:-1], jnp.float32)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        n = si.wi.shape[0]
        t = tex_eval(self.transmittance, si, wavelengths, n_channels)
        bs = BSDFSample(
            wo=-si.wi, pdf=jnp.ones((n,)), eta=jnp.ones((n,)),
            delta=jnp.ones((n,), bool),
        )
        return bs, 0.5 * t

    def sample_pol(self, u_lobe, u2, si, wavelengths, n_channels):
        bs, _ = self.sample(u_lobe, u2, si, wavelengths, n_channels)
        t = tex_eval(self.transmittance, si, wavelengths, n_channels)
        M = mu.rotated_element(self.theta, mu.linear_polarizer(jnp.asarray(1.0)))
        M = jnp.broadcast_to(M, (si.wi.shape[0], n_channels, 4, 4))
        return bs, M * t[..., None, None]


@struct.dataclass
class CircularPolarizerBSDF:
    """Ideal circular polarizer surface (reference: src/bsdfs/circular.cpp):
    transmits right- (or left-) circularly polarized light."""

    transmittance: object
    left: bool = struct.field(pytree_node=False, default=False)

    flags_smooth = False
    flags_transmission = True

    def eval(self, si, wo, wavelengths, n_channels):
        return jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

    def pdf(self, si, wo):
        return jnp.zeros(wo.shape[:-1], jnp.float32)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        n = si.wi.shape[0]
        t = tex_eval(self.transmittance, si, wavelengths, n_channels)
        bs = BSDFSample(
            wo=-si.wi, pdf=jnp.ones((n,)), eta=jnp.ones((n,)),
            delta=jnp.ones((n,), bool),
        )
        return bs, 0.5 * t

    def sample_pol(self, u_lobe, u2, si, wavelengths, n_channels):
        bs, _ = self.sample(u_lobe, u2, si, wavelengths, n_channels)
        t = tex_eval(self.transmittance, si, wavelengths, n_channels)
        M = mu.circular_polarizer(1.0, left=self.left)
        M = jnp.broadcast_to(M, (si.wi.shape[0], n_channels, 4, 4))
        return bs, M * t[..., None, None]


@struct.dataclass
class RetarderBSDF:
    """Ideal linear retarder (wave plate) surface
    (reference: src/bsdfs/retarder.cpp)."""

    theta: jnp.ndarray
    delta_phase: jnp.ndarray   # phase difference (radians); pi/2 = quarter wave
    transmittance: object

    flags_smooth = False
    flags_transmission = True

    def eval(self, si, wo, wavelengths, n_channels):
        return jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

    def pdf(self, si, wo):
        return jnp.zeros(wo.shape[:-1], jnp.float32)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        n = si.wi.shape[0]
        t = tex_eval(self.transmittance, si, wavelengths, n_channels)
        bs = BSDFSample(
            wo=-si.wi, pdf=jnp.ones((n,)), eta=jnp.ones((n,)),
            delta=jnp.ones((n,), bool),
        )
        return bs, t

    def sample_pol(self, u_lobe, u2, si, wavelengths, n_channels):
        bs, _ = self.sample(u_lobe, u2, si, wavelengths, n_channels)
        t = tex_eval(self.transmittance, si, wavelengths, n_channels)
        M = mu.rotated_element(self.theta, mu.linear_retarder(self.delta_phase))
        M = jnp.broadcast_to(M, (si.wi.shape[0], n_channels, 4, 4))
        return bs, M * t[..., None, None]


@struct.dataclass
class RoughPlasticBSDF:
    """Rough plastic: GGX specular coat over Lambertian base with internal
    scattering approximation (reference: src/bsdfs/roughplastic.cpp,
    simplified: no nonlinear internal reflections term)."""

    eta: jnp.ndarray
    alpha: jnp.ndarray
    diffuse_reflectance: object
    specular_reflectance: object

    flags_smooth = True
    flags_transmission = False

    def _spec_prob(self, si):
        f_i, _, _, _ = fresnel(si.wi[..., 2], self.eta)
        return jnp.clip(f_i, 0.15, 0.9)

    def eval(self, si, wo, wavelengths, n_channels):
        cos_i = si.wi[..., 2]
        cos_o = wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        h = normalize(si.wi + wo)
        d = mf.ggx_d(h, self.alpha, self.alpha)
        g = mf.ggx_g(si.wi, wo, h, self.alpha, self.alpha)
        f_h, _, _, _ = fresnel(jnp.sum(si.wi * h, axis=-1), self.eta)
        spec = (f_h * d * g / jnp.maximum(4.0 * cos_i, 1e-9))[..., None]
        spec = spec * tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        f_i, _, _, eta_ti_i = fresnel(cos_i, self.eta)
        f_o, _, _, _ = fresnel(cos_o, self.eta)
        diff = tex_eval(self.diffuse_reflectance, si, wavelengths, n_channels)
        diff = (
            diff
            * ((1.0 - f_i) * (1.0 - f_o) * (1.0 / (self.eta**2)) * INV_PI * jnp.maximum(cos_o, 0.0))[
                ..., None
            ]
        )
        return jnp.where(valid[..., None], spec + diff, 0.0)

    def pdf(self, si, wo):
        valid = (si.wi[..., 2] > 0) & (wo[..., 2] > 0)
        prob = self._spec_prob(si)
        h = normalize(si.wi + wo)
        pdf_spec = mf.ggx_pdf_visible(si.wi, h, self.alpha, self.alpha) / jnp.maximum(
            4.0 * jnp.abs(jnp.sum(wo * h, axis=-1)), 1e-9
        )
        pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo)
        return jnp.where(valid, prob * pdf_spec + (1 - prob) * pdf_diff, 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        prob = self._spec_prob(si)
        pick_spec = u_lobe < prob
        m = mf.ggx_sample_vndf(si.wi, u2[..., 0], u2[..., 1], self.alpha, self.alpha)
        wo_spec = 2.0 * jnp.sum(si.wi * m, axis=-1, keepdims=True) * m - si.wi
        wo_diff = warp.square_to_cosine_hemisphere(u2)
        wo = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
        pdf = self.pdf(si, wo)
        val = self.eval(si, wo, wavelengths, n_channels)
        weight = jnp.where(
            (pdf > 1e-12)[..., None], val / jnp.maximum(pdf, 1e-12)[..., None], 0.0
        )
        bs = BSDFSample(
            wo=wo, pdf=pdf, eta=jnp.ones_like(pdf), delta=jnp.zeros(pdf.shape, bool)
        )
        return bs, weight


@struct.dataclass
class PPlasticBSDF(RoughPlasticBSDF):
    """Polarized plastic (reference: src/bsdfs/pplastic.cpp): GGX specular
    lobe with the full polarized Fresnel Mueller matrix + Lambertian base
    acting as an ideal depolarizer.  Scalar magnitudes (and therefore the
    unpolarized image) match RoughPlasticBSDF exactly."""

    def _lobes(self, si, wo, wavelengths, n_channels):
        """(spec [N,C], diff [N,C]) scalar magnitudes of the two lobes."""
        cos_i = si.wi[..., 2]
        cos_o = wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        h = normalize(si.wi + wo)
        d = mf.ggx_d(h, self.alpha, self.alpha)
        g = mf.ggx_g(si.wi, wo, h, self.alpha, self.alpha)
        f_h, _, _, _ = fresnel(jnp.sum(si.wi * h, axis=-1), self.eta)
        spec = (f_h * d * g / jnp.maximum(4.0 * cos_i, 1e-9))[..., None]
        spec = spec * tex_eval(self.specular_reflectance, si, wavelengths, n_channels)
        f_i, _, _, _ = fresnel(cos_i, self.eta)
        f_o, _, _, _ = fresnel(cos_o, self.eta)
        diff = tex_eval(self.diffuse_reflectance, si, wavelengths, n_channels)
        diff = diff * (
            (1.0 - f_i) * (1.0 - f_o) * (1.0 / (self.eta**2))
            * INV_PI * jnp.maximum(cos_o, 0.0)
        )[..., None]
        zero = jnp.zeros_like(spec)
        return (
            jnp.where(valid[..., None], spec, zero),
            jnp.where(valid[..., None], diff, zero),
        )

    def eval_pdf_mueller(self, si, wo, wavelengths, n_channels):
        spec, diff = self._lobes(si, wo, wavelengths, n_channels)
        pdf = self.pdf(si, wo)
        h = normalize(si.wi + wo)
        cos_h = jnp.sum(wo * h, axis=-1)
        R = mu.specular_reflection(
            cos_h[..., None], jnp.asarray(self.eta, jnp.complex64)
        )
        R = jnp.broadcast_to(R, R.shape[:-3] + (n_channels, 4, 4))
        m00 = R[..., 0:1, 0:1]
        R = jnp.where(jnp.abs(m00) > 1e-12, R / jnp.where(jnp.abs(m00) > 1e-12, m00, 1.0), 0.0)
        R = rotate_specular_mueller_m(R, wo, si.wi, h)
        M = R * spec[..., None, None] + mu.depolarizer(jnp.asarray(1.0)) * diff[..., None, None]
        return jnp.nan_to_num(M), pdf

    def sample_pol(self, u_lobe, u2, si, wavelengths, n_channels):
        bs, _ = self.sample(u_lobe, u2, si, wavelengths, n_channels)
        M, pdf = self.eval_pdf_mueller(si, bs.wo, wavelengths, n_channels)
        w = M / jnp.maximum(pdf, 1e-12)[..., None, None, None]
        return bs, jnp.where((pdf > 1e-12)[..., None, None, None], w, 0.0)
