"""Principled (Disney) BSDF family + true smooth plastic.

Reference: src/bsdfs/principled.cpp (902 LoC), principledthin.cpp,
principledhelpers.h, plastic.cpp — re-derived here as masked SoA JAX code.
Burley 2012/2015 Disney BRDF/BSDF.

Conventions follow render/bsdfs.py: eval() returns f(wi, wo) * |cos_theta_o|,
sample() returns (BSDFSample, weight=eval/pdf).  `has_*` switches are static
Python bools chosen at load time (the reference's m_has_* flags,
principled.cpp:189-237) so XLA only traces the active lobes.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import warp
from ..core.frame import normalize
from ..core.math import INV_PI, safe_sqrt
from . import microfacet as mf
from .fresnel import fresnel, fresnel_diffuse_reflectance
from .records import BSDFSample

_LUM_RGB = jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)

def _reflect_m(wi, m):
    """Mirror wi about an arbitrary unit normal m."""
    return 2.0 * jnp.sum(wi * m, axis=-1, keepdims=True) * m - wi



def _luminance(spec, n_channels):
    """Luminance of an [.., C] spectrum (reference: mitsuba::luminance)."""
    if n_channels == 3:
        return jnp.sum(spec * _LUM_RGB, axis=-1)
    return jnp.mean(spec, axis=-1)


def _mulsign(v, s):
    return jnp.where(s[..., None] >= 0, v, -v)


def _schlick_weight(cos_i):
    """(1-cos)^5 (principledhelpers.h:140-144)."""
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return (m * m) ** 2 * m


def _calc_schlick(R0, cos_theta_i, eta):
    """Schlick Fresnel; uses the transmitted angle when eta<1
    (principledhelpers.h:156-170).  R0 may be [..] or [.., C]."""
    outside = cos_theta_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)
    cos_t2 = 1.0 - (1.0 - cos_theta_i**2) * eta_ti**2
    cos_t = safe_sqrt(cos_t2)
    w = jnp.where(
        eta_it > 1.0, _schlick_weight(jnp.abs(cos_theta_i)), _schlick_weight(cos_t)
    )
    if R0.ndim > w.ndim:
        w = w[..., None]
    return R0 + (1.0 - R0) * w


def _schlick_R0_eta(eta):
    return ((eta - 1.0) / (eta + 1.0)) ** 2


def _mac_mic_compat(m, wi, wo, cos_theta_i, reflection):
    """Micro/macro surface agreement mask (principledhelpers.h:198-211)."""
    m_up = _mulsign(m, cos_theta_i)
    if reflection:
        return (jnp.sum(wi * m_up, axis=-1) > 0) & (jnp.sum(wo * m_up, axis=-1) > 0)
    return (jnp.sum(wi * m_up, axis=-1) > 0) & (jnp.sum(wo * -m_up, axis=-1) > 0)


def _principled_fresnel(F_diel, metallic, spec_tint, base_color, lum, cos_wi_h,
                        front_side, bsdf_w, eta, has_metallic, has_spec_tint):
    """Blended metallic/dielectric Fresnel (principledhelpers.h:238-275).
    Returns [.., C]."""
    outside = cos_wi_h >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    F_schlick = jnp.zeros_like(base_color)
    if has_metallic:
        F_schlick = F_schlick + metallic[..., None] * _calc_schlick(
            base_color, cos_wi_h, eta
        )
    if has_spec_tint:
        c_tint = jnp.where(lum[..., None] > 0, base_color / jnp.maximum(lum, 1e-12)[..., None], 1.0)
        F0 = c_tint * _schlick_R0_eta(eta_it)[..., None]
        F_schlick = F_schlick + ((1.0 - metallic) * spec_tint)[..., None] * _calc_schlick(
            F0, cos_wi_h, eta
        )
    F_front = ((1.0 - metallic) * (1.0 - spec_tint) * F_diel)[..., None] + F_schlick
    return jnp.where(front_side[..., None], F_front, (bsdf_w * F_diel)[..., None])


def _dist_params(anisotropic, roughness, has_anisotropic):
    """roughness^2 -> (alpha_x, alpha_y) (principledhelpers.h:320-331)."""
    r2 = roughness * roughness
    if not has_anisotropic:
        a = jnp.maximum(0.001, r2)
        return a, a
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropic)
    return jnp.maximum(0.001, r2 / aspect), jnp.maximum(0.001, r2 * aspect)


def _eval_tex1(tex, si, n_channels):
    """Scalar texture eval (reference eval_1): mean over channels."""
    return jnp.mean(tex.eval(si.uv, None, n_channels), axis=-1)


@struct.dataclass
class PrincipledBSDF:
    """The Disney principled BSDF (reference: src/bsdfs/principled.cpp)."""

    base_color: object
    roughness: object
    anisotropic: object
    metallic: object
    spec_trans: object
    spec_tint: object
    sheen: object
    sheen_tint: object
    flatness: object
    clearcoat: object
    clearcoat_gloss: object
    eta: jnp.ndarray

    has_anisotropic: bool = struct.field(pytree_node=False, default=False)
    has_metallic: bool = struct.field(pytree_node=False, default=False)
    has_spec_trans: bool = struct.field(pytree_node=False, default=False)
    has_spec_tint: bool = struct.field(pytree_node=False, default=False)
    has_sheen: bool = struct.field(pytree_node=False, default=False)
    has_sheen_tint: bool = struct.field(pytree_node=False, default=False)
    has_flatness: bool = struct.field(pytree_node=False, default=False)
    has_clearcoat: bool = struct.field(pytree_node=False, default=False)
    spec_srate: float = struct.field(pytree_node=False, default=1.0)
    clearcoat_srate: float = struct.field(pytree_node=False, default=1.0)
    diff_refl_srate: float = struct.field(pytree_node=False, default=1.0)

    flags_smooth = True

    @property
    def flags_transmission(self):
        return self.has_spec_trans

    # -- shared per-shading-point quantities -------------------------------
    def _weights(self, si, n_channels):
        aniso = _eval_tex1(self.anisotropic, si, n_channels) if self.has_anisotropic else 0.0
        rough = _eval_tex1(self.roughness, si, n_channels)
        st = _eval_tex1(self.spec_trans, si, n_channels) if self.has_spec_trans else 0.0
        met = _eval_tex1(self.metallic, si, n_channels) if self.has_metallic else 0.0
        cc = _eval_tex1(self.clearcoat, si, n_channels) if self.has_clearcoat else 0.0
        if not self.has_anisotropic:
            aniso = jnp.zeros_like(rough)
        if not self.has_spec_trans:
            st = jnp.zeros_like(rough)
        if not self.has_metallic:
            met = jnp.zeros_like(rough)
        if not self.has_clearcoat:
            cc = jnp.zeros_like(rough)
        return aniso, rough, st, met, cc

    def _lobe_probs(self, front_side, bsdf_w, brdf_w, F_spec_diel, clearcoat):
        """Unnormalized lobe probabilities (principled.cpp:375-401)."""
        p_sr = jnp.where(
            front_side, self.spec_srate * (1.0 - bsdf_w * (1.0 - F_spec_diel)),
            F_spec_diel,
        )
        p_st = (
            jnp.where(front_side, self.spec_srate * bsdf_w * (1.0 - F_spec_diel),
                      1.0 - F_spec_diel)
            if self.has_spec_trans else jnp.zeros_like(p_sr)
        )
        p_cc = (
            jnp.where(front_side, 0.25 * clearcoat * self.clearcoat_srate, 0.0)
            if self.has_clearcoat else jnp.zeros_like(p_sr)
        )
        p_d = jnp.where(front_side, brdf_w * self.diff_refl_srate, 0.0)
        tot = jnp.maximum(p_sr + p_st + p_cc + p_d, 1e-12)
        return p_sr / tot, p_st / tot, p_cc / tot, p_d / tot

    def eval(self, si, wo, wavelengths, n_channels):
        """principled.cpp:494-710."""
        wi = si.wi
        cos_i = wi[..., 2]
        cos_o = wo[..., 2]
        active = cos_i != 0.0
        aniso, rough, spec_trans, metallic, clearcoat = self._weights(si, n_channels)
        flat = _eval_tex1(self.flatness, si, n_channels) if self.has_flatness else 0.0
        sheen = _eval_tex1(self.sheen, si, n_channels) if self.has_sheen else 0.0
        base_color = self.base_color.eval(si.uv, wavelengths, n_channels)

        brdf_w = (1.0 - metallic) * (1.0 - spec_trans)
        bsdf_w = (1.0 - metallic) * spec_trans

        reflect_m = cos_i * cos_o > 0
        refract_m = cos_i * cos_o < 0
        front_side = cos_i > 0
        eta = self.eta
        eta_path = jnp.where(front_side, eta, 1.0 / eta)
        inv_eta_path = jnp.where(front_side, 1.0 / eta, eta)

        ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
        wh = normalize(wi + wo * jnp.where(reflect_m, 1.0, eta_path)[..., None])
        wh = _mulsign(wh, wh[..., 2])

        cos_wi_h = jnp.sum(wi * wh, axis=-1)
        F_spec_diel, _, _, _ = fresnel(cos_wi_h, eta)

        compat_r = _mac_mic_compat(wh, wi, wo, cos_i, True)
        compat_t = _mac_mic_compat(wh, wi, wo, cos_i, False)

        D = mf.ggx_d(wh, ax, ay)
        wi_up = _mulsign(wi, cos_i)
        wo_up = _mulsign(wo, cos_o)
        G = mf.smith_g1_ggx(wi_up, wh, ax, ay) * mf.smith_g1_ggx(wo_up, wh, ax, ay)

        value = jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

        # main specular reflection (principled.cpp:585-602)
        sr_act = active & reflect_m & compat_r & (F_spec_diel > 0)
        lum = _luminance(base_color, n_channels)
        spec_tint = (
            _eval_tex1(self.spec_tint, si, n_channels) if self.has_spec_tint else jnp.zeros_like(rough)
        )
        F_pr = _principled_fresnel(
            F_spec_diel, metallic, spec_tint, base_color, lum, cos_wi_h,
            front_side, bsdf_w, eta, self.has_metallic, self.has_spec_tint,
        )
        spec_val = F_pr * (D * G / (4.0 * jnp.maximum(jnp.abs(cos_i), 1e-9)))[..., None]
        value = value + jnp.where(sr_act[..., None], spec_val, 0.0)

        # main specular transmission (principled.cpp:605-620)
        if self.has_spec_trans:
            st_act = active & refract_m & compat_t & (bsdf_w > 0) & (F_spec_diel < 1)
            cos_wo_h = jnp.sum(wo * wh, axis=-1)
            denom = (cos_wi_h + eta_path * cos_wo_h) ** 2
            scale = inv_eta_path**2   # radiance transport solid-angle compression
            tval = jnp.sqrt(jnp.maximum(base_color, 0.0)) * bsdf_w[..., None] * jnp.abs(
                scale * (1.0 - F_spec_diel) * D * G * eta_path**2 * cos_wi_h * cos_wo_h
                / jnp.where(jnp.abs(cos_i * denom) > 1e-12, cos_i * denom, 1e-12)
            )[..., None]
            value = value + jnp.where(st_act[..., None], tval, 0.0)

        # clearcoat (principled.cpp:623-641)
        if self.has_clearcoat:
            cc_act = active & reflect_m & compat_r & front_side & (clearcoat > 0)
            gloss = _eval_tex1(self.clearcoat_gloss, si, n_channels)
            cc_alpha = 0.1 + (0.001 - 0.1) * gloss
            Fcc = _calc_schlick(jnp.asarray(0.04, jnp.float32), cos_wi_h, eta)
            Dcc = mf.gtr1_d(wh, cc_alpha)
            Gcc = mf.smith_ggx1(wi, wh, 0.25) * mf.smith_ggx1(wo, wh, 0.25)
            ccv = (clearcoat * 0.25) * Fcc * Dcc * Gcc * jnp.abs(cos_o)
            value = value + jnp.where(cc_act[..., None], ccv[..., None], 0.0)

        # diffuse + retro + fake subsurface + sheen (principled.cpp:645-708)
        d_act = active & reflect_m & front_side & (brdf_w > 0)
        Fo = _schlick_weight(jnp.abs(cos_o))
        Fi = _schlick_weight(jnp.abs(cos_i))
        f_diff = (1.0 - 0.5 * Fi) * (1.0 - 0.5 * Fo)
        cos_d = jnp.sum(wh * wo, axis=-1)
        Rr = 2.0 * rough * cos_d**2
        f_retro = Rr * (Fo + Fi + Fo * Fi * (Rr - 1.0))
        if self.has_flatness:
            Fss90 = Rr / 2.0
            Fss = (1.0 + (Fss90 - 1.0) * Fo) * (1.0 + (Fss90 - 1.0) * Fi)
            f_ss = 1.25 * (
                Fss * (1.0 / jnp.maximum(jnp.abs(cos_o) + jnp.abs(cos_i), 1e-9) - 0.5)
                + 0.5
            )
            f_d = (1.0 - flat) * (f_diff + f_retro) + flat * f_ss
        else:
            f_d = f_diff + f_retro
        dv = (brdf_w * jnp.abs(cos_o) * INV_PI * f_d)[..., None] * base_color
        value = value + jnp.where(d_act[..., None], dv, 0.0)

        if self.has_sheen:
            sh_act = active & reflect_m & front_side & (sheen > 0) & (metallic < 1)
            Fd = _schlick_weight(jnp.abs(cos_d))
            if self.has_sheen_tint:
                stint = _eval_tex1(self.sheen_tint, si, n_channels)
                c_tint = jnp.where(
                    lum[..., None] > 0, base_color / jnp.maximum(lum, 1e-12)[..., None], 1.0
                )
                c_sheen = 1.0 + (c_tint - 1.0) * stint[..., None]
            else:
                c_sheen = jnp.ones_like(base_color)
            shv = (sheen * (1.0 - metallic) * Fd * jnp.abs(cos_o))[..., None] * c_sheen
            value = value + jnp.where(sh_act[..., None], shv, 0.0)

        return jnp.where(active[..., None], value, 0.0)

    def pdf(self, si, wo):
        """principled.cpp:712-838."""
        wi = si.wi
        n_channels = 1
        cos_i = wi[..., 2]
        cos_o = wo[..., 2]
        active = cos_i != 0.0
        aniso, rough, spec_trans, metallic, clearcoat = self._weights(si, n_channels)
        brdf_w = (1.0 - metallic) * (1.0 - spec_trans)
        bsdf_w = (1.0 - metallic) * spec_trans
        front_side = cos_i > 0
        eta_path = jnp.where(front_side, self.eta, 1.0 / self.eta)
        reflect_m = cos_i * cos_o > 0
        refract_m = cos_i * cos_o < 0

        wh = normalize(wi + wo * jnp.where(reflect_m, 1.0, eta_path)[..., None])
        wh = _mulsign(wh, wh[..., 2])
        ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
        cos_wi_h = jnp.sum(wi * wh, axis=-1)
        F_spec_diel, _, _, _ = fresnel(cos_wi_h, self.eta)

        p_sr, p_st, p_cc, p_d = self._lobe_probs(
            front_side, bsdf_w, brdf_w, F_spec_diel, clearcoat
        )

        cos_wo_h = jnp.sum(wo * wh, axis=-1)
        if self.has_spec_trans:
            dwh_dwo = jnp.abs(jnp.where(
                reflect_m,
                1.0 / jnp.maximum(4.0 * jnp.abs(cos_wo_h), 1e-12),
                (eta_path**2 * cos_wo_h)
                / jnp.maximum((cos_wi_h + eta_path * cos_wo_h) ** 2, 1e-12),
            ))
        else:
            dwh_dwo = 1.0 / jnp.maximum(4.0 * jnp.abs(cos_wo_h), 1e-12)

        pdf = jnp.zeros_like(cos_i)
        compat_r = _mac_mic_compat(wh, wi, wo, cos_i, True) & reflect_m
        wi_up = _mulsign(wi, cos_i)
        pdf = pdf + jnp.where(
            compat_r, p_sr * mf.ggx_pdf_visible(wi_up, wh, ax, ay) * dwh_dwo, 0.0
        )
        pdf = pdf + jnp.where(
            reflect_m, p_d * warp.square_to_cosine_hemisphere_pdf(_mulsign(wo, cos_o)), 0.0
        )
        if self.has_spec_trans:
            compat_t = _mac_mic_compat(wh, wi, wo, cos_i, False) & refract_m
            pdf = pdf + jnp.where(
                compat_t, p_st * mf.ggx_pdf_visible(wi_up, wh, ax, ay) * dwh_dwo, 0.0
            )
        if self.has_clearcoat:
            gloss = _eval_tex1(self.clearcoat_gloss, si, n_channels)
            cc_alpha = 0.1 + (0.001 - 0.1) * gloss
            pdf = pdf + jnp.where(compat_r, p_cc * mf.gtr1_pdf(wh, cc_alpha) * dwh_dwo, 0.0)
        return jnp.where(active, pdf, 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        """principled.cpp:333-492: pick lobe by u_lobe, build wo, then weight
        through the full pdf/eval (one-sample MIS over lobes)."""
        wi = si.wi
        cos_i = wi[..., 2]
        active = cos_i != 0.0
        aniso, rough, spec_trans, metallic, clearcoat = self._weights(si, n_channels)
        brdf_w = (1.0 - metallic) * (1.0 - spec_trans)
        bsdf_w = (1.0 - metallic) * spec_trans
        front_side = cos_i > 0

        ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
        wi_up = _mulsign(wi, cos_i)
        m_spec = mf.ggx_sample_vndf(wi_up, u2[..., 0], u2[..., 1], ax, ay)
        F_spec_diel, cos_theta_t, eta_it, eta_ti = fresnel(
            jnp.sum(wi * m_spec, axis=-1), self.eta
        )
        active = active & (front_side | (bsdf_w > 0))

        p_sr, p_st, p_cc, p_d = self._lobe_probs(
            front_side, bsdf_w, brdf_w, F_spec_diel, clearcoat
        )

        pick_d = u_lobe < p_d
        pick_cc = (u_lobe >= p_d) & (u_lobe < p_d + p_cc) & self.has_clearcoat
        pick_st = (
            (u_lobe >= p_d + p_cc) & (u_lobe < p_d + p_cc + p_st) & self.has_spec_trans
        )
        pick_sr = u_lobe >= p_d + p_cc + p_st

        # candidate directions
        wo_sr = _reflect_m(wi, m_spec)
        # refract about m_spec (fresnel.h refract)
        wo_st = (
            eta_ti[..., None] * (-wi)
            + (eta_ti * jnp.sum(wi * m_spec, axis=-1) + cos_theta_t)[..., None] * m_spec
        )
        gloss = (
            _eval_tex1(self.clearcoat_gloss, si, n_channels)
            if self.has_clearcoat else jnp.zeros_like(rough)
        )
        cc_alpha = 0.1 + (0.001 - 0.1) * gloss
        m_cc = mf.gtr1_sample(u2[..., 0], u2[..., 1], cc_alpha)
        wo_cc = _reflect_m(wi, m_cc)
        wo_d = _mulsign(warp.square_to_cosine_hemisphere(u2), cos_i)

        wo = jnp.where(
            pick_d[..., None], wo_d,
            jnp.where(pick_cc[..., None], wo_cc,
                      jnp.where(pick_st[..., None], wo_st, wo_sr)),
        )
        cos_o = wo[..., 2]

        # compatibility filters per sampled lobe (principled.cpp:428-486)
        ok_sr = _mac_mic_compat(m_spec, wi, wo, cos_i, True) & (cos_i * cos_o > 0)
        ok_st = _mac_mic_compat(m_spec, wi, wo, cos_i, False) & (cos_i * cos_o < 0)
        ok_cc = _mac_mic_compat(m_cc, wi, wo, cos_i, True) & (cos_i * cos_o > 0)
        ok_d = cos_i * cos_o > 0
        active = active & jnp.where(
            pick_d, ok_d, jnp.where(pick_cc, ok_cc, jnp.where(pick_st, ok_st, ok_sr))
        )

        pdf = self.pdf(si, wo)
        active = active & (pdf > 0)
        val = self.eval(si, wo, wavelengths, n_channels)
        weight = jnp.where(
            active[..., None], val / jnp.maximum(pdf, 1e-20)[..., None], 0.0
        )
        bs = BSDFSample(
            wo=wo,
            pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.where(pick_st, eta_it, 1.0),
            delta=jnp.zeros_like(active),
        )
        return bs, weight


@struct.dataclass
class PrincipledThinBSDF:
    """Thin-surface principled BSDF (reference: src/bsdfs/principledthin.cpp).
    Symmetric 2D sheet: no refraction bending (eta=1 path), specular
    transmission is a flipped reflection with IOR-scaled roughness
    (Burley 2015 fig. 15), plus diffuse Lambertian transmission."""

    base_color: object
    roughness: object
    anisotropic: object
    spec_trans: object
    spec_tint: object
    sheen: object
    sheen_tint: object
    flatness: object
    diff_trans: object
    eta_thin: object          # texture (reference: m_eta_thin)

    has_anisotropic: bool = struct.field(pytree_node=False, default=False)
    has_spec_trans: bool = struct.field(pytree_node=False, default=False)
    has_spec_tint: bool = struct.field(pytree_node=False, default=False)
    has_sheen: bool = struct.field(pytree_node=False, default=False)
    has_sheen_tint: bool = struct.field(pytree_node=False, default=False)
    has_flatness: bool = struct.field(pytree_node=False, default=False)
    has_diff_trans: bool = struct.field(pytree_node=False, default=False)
    spec_refl_srate: float = struct.field(pytree_node=False, default=1.0)
    spec_trans_srate: float = struct.field(pytree_node=False, default=1.0)
    diff_trans_srate: float = struct.field(pytree_node=False, default=1.0)
    diff_refl_srate: float = struct.field(pytree_node=False, default=1.0)

    flags_smooth = True

    @property
    def flags_transmission(self):
        return self.has_spec_trans or self.has_diff_trans

    def _weights(self, si, n_channels):
        aniso = _eval_tex1(self.anisotropic, si, n_channels) if self.has_anisotropic else 0.0
        rough = _eval_tex1(self.roughness, si, n_channels)
        st = _eval_tex1(self.spec_trans, si, n_channels) if self.has_spec_trans else 0.0
        dt = _eval_tex1(self.diff_trans, si, n_channels) / 2.0 if self.has_diff_trans else 0.0
        eta_t = _eval_tex1(self.eta_thin, si, n_channels)
        if not self.has_anisotropic:
            aniso = jnp.zeros_like(rough)
        if not self.has_spec_trans:
            st = jnp.zeros_like(rough)
        if not self.has_diff_trans:
            dt = jnp.zeros_like(rough)
        return aniso, rough, st, dt, eta_t

    def _lobe_probs(self, spec_trans, diff_trans):
        """principledthin.cpp:292-310."""
        p_sr = spec_trans * self.spec_refl_srate / 2.0 if self.has_spec_trans else jnp.zeros_like(spec_trans)
        p_st = spec_trans * self.spec_trans_srate / 2.0 if self.has_spec_trans else jnp.zeros_like(spec_trans)
        p_dr = self.diff_refl_srate * (1.0 - spec_trans) * (1.0 - diff_trans)
        p_dt = (
            self.diff_trans_srate * (1.0 - spec_trans) * diff_trans
            if self.has_diff_trans else jnp.zeros_like(spec_trans)
        )
        tot = jnp.maximum(p_sr + p_st + p_dr + p_dt, 1e-12)
        return p_sr / tot, p_st / tot, p_dr / tot, p_dt / tot

    def eval(self, si, wo, wavelengths, n_channels):
        """principledthin.cpp:421-599."""
        cos_i_raw = si.wi[..., 2]
        active = cos_i_raw != 0.0
        aniso, rough, spec_trans, diff_trans, eta_t = self._weights(si, n_channels)
        flat = _eval_tex1(self.flatness, si, n_channels) if self.has_flatness else 0.0
        base_color = self.base_color.eval(si.uv, wavelengths, n_channels)

        wi = _mulsign(si.wi, cos_i_raw)
        wo_t = _mulsign(wo, cos_i_raw)
        cos_i = jnp.abs(cos_i_raw)
        cos_o = wo_t[..., 2]
        reflect_m = cos_o > 0
        refract_m = cos_o < 0

        wo_r = jnp.concatenate([wo_t[..., :2], jnp.abs(wo_t[..., 2:3])], axis=-1)
        wh = normalize(wi + wo_r)

        value = jnp.zeros(wo.shape[:-1] + (n_channels,), jnp.float32)

        if self.has_spec_trans:
            cos_wi_h = jnp.sum(wi * wh, axis=-1)
            F_diel, _, _, _ = fresnel(cos_wi_h, eta_t)
            compat_r = _mac_mic_compat(wh, wi, wo_t, wi[..., 2], True)
            compat_t = _mac_mic_compat(wh, wi, wo_t, wi[..., 2], False)

            # thin specular reflection (…:479-501)
            sr_act = active & reflect_m & compat_r & (spec_trans > 0)
            ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
            D = mf.ggx_d(wh, ax, ay)
            G = mf.ggx_g(wi, wo_r, wh, ax, ay)
            lum = _luminance(base_color, n_channels)
            if self.has_spec_tint:
                stint = _eval_tex1(self.spec_tint, si, n_channels)
                c_tint = jnp.where(
                    lum[..., None] > 0, base_color / jnp.maximum(lum, 1e-12)[..., None], 1.0
                )
                F0 = c_tint * _schlick_R0_eta(eta_t)[..., None]
                F_sch = _calc_schlick(F0, cos_wi_h, eta_t)
                F_thin = F_diel[..., None] * (1.0 - stint[..., None]) + stint[..., None] * F_sch
            else:
                F_thin = jnp.broadcast_to(F_diel[..., None], base_color.shape)
            srv = (spec_trans * D * G / (4.0 * jnp.maximum(cos_i, 1e-9)))[..., None] * F_thin
            value = value + jnp.where(sr_act[..., None], srv, 0.0)

            # thin specular transmission (…:503-525): scaled roughness
            st_act = active & refract_m & compat_t & (spec_trans > 0)
            rough_sc = (0.65 * eta_t - 0.35) * rough
            axs, ays = _dist_params(aniso, rough_sc, self.has_anisotropic)
            Ds = mf.ggx_d(wh, axs, ays)
            Gs = mf.ggx_g(wi, wo_r, wh, axs, ays)
            stv = (spec_trans * (1.0 - F_diel) * Ds * Gs
                   / (4.0 * jnp.maximum(cos_i, 1e-9)))[..., None] * base_color
            value = value + jnp.where(st_act[..., None], stv, 0.0)

        # diffuse/retro/fss + sheen (…:528-591)
        d_act = active & reflect_m & (spec_trans < 1) & (diff_trans < 1)
        Fo = _schlick_weight(jnp.abs(cos_o))
        Fi = _schlick_weight(cos_i)
        f_diff = (1.0 - 0.5 * Fi) * (1.0 - 0.5 * Fo)
        cos_d = jnp.sum(wh * wo_t, axis=-1)
        Rr = 2.0 * rough * cos_d**2
        f_retro = Rr * (Fo + Fi + Fo * Fi * (Rr - 1.0))
        if self.has_flatness:
            Fss90 = Rr / 2.0
            Fss = (1.0 + (Fss90 - 1.0) * Fo) * (1.0 + (Fss90 - 1.0) * Fi)
            f_ss = 1.25 * (
                Fss * (1.0 / jnp.maximum(jnp.abs(cos_o) + cos_i, 1e-9) - 0.5) + 0.5
            )
            f_d = (1.0 - flat) * (f_diff + f_retro) + flat * f_ss
        else:
            f_d = f_diff + f_retro
        dv = ((1.0 - spec_trans) * (1.0 - diff_trans) * cos_o * INV_PI * f_d)[..., None] * base_color
        value = value + jnp.where(d_act[..., None], dv, 0.0)

        if self.has_sheen:
            sheen = _eval_tex1(self.sheen, si, n_channels)
            sh_act = d_act & (sheen > 0)
            Fd = _schlick_weight(jnp.abs(cos_d))
            lum = _luminance(base_color, n_channels)
            if self.has_sheen_tint:
                stint = _eval_tex1(self.sheen_tint, si, n_channels)
                c_tint = jnp.where(
                    lum[..., None] > 0, base_color / jnp.maximum(lum, 1e-12)[..., None], 1.0
                )
                c_sheen = 1.0 + (c_tint - 1.0) * stint[..., None]
            else:
                c_sheen = jnp.ones_like(base_color)
            shv = (sheen * (1.0 - spec_trans) * Fd * (1.0 - diff_trans)
                   * jnp.abs(cos_o))[..., None] * c_sheen
            value = value + jnp.where(sh_act[..., None], shv, 0.0)

        if self.has_diff_trans:
            dt_act = active & refract_m & (spec_trans < 1) & (diff_trans > 0)
            dtv = ((1.0 - spec_trans) * diff_trans * INV_PI * jnp.abs(cos_o))[..., None] * base_color
            value = value + jnp.where(dt_act[..., None], dtv, 0.0)

        return jnp.where(active[..., None], value, 0.0)

    def pdf(self, si, wo):
        """principledthin.cpp:602-699."""
        n_channels = 1
        cos_i_raw = si.wi[..., 2]
        active = cos_i_raw != 0.0
        aniso, rough, spec_trans, diff_trans, eta_t = self._weights(si, n_channels)
        wi = _mulsign(si.wi, cos_i_raw)
        wo_t = _mulsign(wo, cos_i_raw)
        cos_o = wo_t[..., 2]
        reflect_m = cos_o > 0
        refract_m = cos_o < 0

        p_sr, p_st, p_dr, p_dt = self._lobe_probs(spec_trans, diff_trans)
        pdf = jnp.zeros_like(cos_o)

        if self.has_spec_trans:
            wo_r = jnp.concatenate([wo_t[..., :2], jnp.abs(wo_t[..., 2:3])], axis=-1)
            wh = normalize(wi + wo_r)
            compat_r = _mac_mic_compat(wh, wi, wo_t, wi[..., 2], True) & reflect_m
            compat_t = _mac_mic_compat(wh, wi, wo_t, wi[..., 2], False) & refract_m
            dwh_dwo = 1.0 / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo_r * wh, axis=-1)), 1e-12)
            ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
            rough_sc = (0.65 * eta_t - 0.35) * rough
            axs, ays = _dist_params(aniso, rough_sc, self.has_anisotropic)
            pdf = pdf + jnp.where(
                compat_r, p_sr * mf.ggx_pdf_visible(wi, wh, ax, ay) * dwh_dwo, 0.0
            )
            pdf = pdf + jnp.where(
                compat_t, p_st * mf.ggx_pdf_visible(wi, wh, axs, ays) * dwh_dwo, 0.0
            )
        pdf = pdf + jnp.where(
            reflect_m, p_dr * warp.square_to_cosine_hemisphere_pdf(wo_t), 0.0
        )
        if self.has_diff_trans:
            pdf = pdf + jnp.where(
                refract_m, p_dt * warp.square_to_cosine_hemisphere_pdf(-wo_t), 0.0
            )
        return jnp.where(active, pdf, 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        """principledthin.cpp:261-419."""
        cos_i_raw = si.wi[..., 2]
        active = cos_i_raw != 0.0
        aniso, rough, spec_trans, diff_trans, eta_t = self._weights(si, n_channels)
        wi = _mulsign(si.wi, cos_i_raw)

        p_sr, p_st, p_dr, p_dt = self._lobe_probs(spec_trans, diff_trans)
        pick_sr = (u_lobe < p_sr) & self.has_spec_trans
        pick_st = (u_lobe >= p_sr) & (u_lobe < p_sr + p_st) & self.has_spec_trans
        pick_dr = (u_lobe >= p_sr + p_st) & (u_lobe < p_sr + p_st + p_dr)
        pick_dt = (u_lobe >= p_sr + p_st + p_dr) & self.has_diff_trans

        ax, ay = _dist_params(aniso, rough, self.has_anisotropic)
        m_sr = mf.ggx_sample_vndf(wi, u2[..., 0], u2[..., 1], ax, ay)
        wo_sr = _reflect_m(wi, m_sr)
        rough_sc = (0.65 * eta_t - 0.35) * rough
        axs, ays = _dist_params(aniso, rough_sc, self.has_anisotropic)
        m_st = mf.ggx_sample_vndf(wi, u2[..., 0], u2[..., 1], axs, ays)
        wo_st = _reflect_m(wi, m_st)
        wo_st = jnp.concatenate([wo_st[..., :2], -wo_st[..., 2:3]], axis=-1)
        wo_dr = warp.square_to_cosine_hemisphere(u2)
        wo_dt = -wo_dr

        wo = jnp.where(
            pick_sr[..., None], wo_sr,
            jnp.where(pick_st[..., None], wo_st,
                      jnp.where(pick_dt[..., None], wo_dt, wo_dr)),
        )
        ok_sr = _mac_mic_compat(m_sr, wi, wo, wi[..., 2], True) & (wo[..., 2] > 0)
        ok_st = _mac_mic_compat(m_st, wi, wo, wi[..., 2], False) & (wo[..., 2] < 0)
        active = active & jnp.where(pick_sr, ok_sr, jnp.where(pick_st, ok_st, True))

        # undo the front-side flip
        wo = _mulsign(wo, cos_i_raw)
        pdf = self.pdf(si, wo)
        active = active & (pdf > 0)
        val = self.eval(si, wo, wavelengths, n_channels)
        weight = jnp.where(
            active[..., None], val / jnp.maximum(pdf, 1e-20)[..., None], 0.0
        )
        bs = BSDFSample(
            wo=wo,
            pdf=jnp.where(active, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            delta=jnp.zeros_like(active),
        )
        return bs, weight


@struct.dataclass
class SmoothPlasticBSDF:
    """True smooth plastic: delta specular lobe + internally-scattered
    diffuse with Fresnel transmittance on both interfaces and the
    1/(1 - rho * Fdr) interreflection series (reference:
    src/bsdfs/plastic.cpp:163-345).  Replaces the round-1 alpha=0.01
    roughplastic stand-in."""

    eta: jnp.ndarray
    diffuse_reflectance: object
    specular_reflectance: object
    nonlinear: bool = struct.field(pytree_node=False, default=False)
    specular_sampling_weight: float = struct.field(pytree_node=False, default=0.5)

    flags_smooth = True        # has a smooth (diffuse) component
    flags_transmission = False

    def _fdr_int(self):
        # diffuse Fresnel reflectance at the *interior* side (plastic.cpp:199)
        return fresnel_diffuse_reflectance(1.0 / self.eta)

    def _probs(self, cos_i):
        f_i, _, _, _ = fresnel(cos_i, self.eta)
        w = self.specular_sampling_weight
        ps = f_i * w
        pd = (1.0 - f_i) * (1.0 - w)
        ps = ps / jnp.maximum(ps + pd, 1e-12)
        return f_i, ps, 1.0 - ps

    def eval(self, si, wo, wavelengths, n_channels):
        """Diffuse term only — the specular lobe is a delta
        (plastic.cpp:276-306)."""
        cos_i = si.wi[..., 2]
        cos_o = wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        f_i, _, _, _ = fresnel(cos_i, self.eta)
        f_o, _, _, _ = fresnel(cos_o, self.eta)
        diff = self.diffuse_reflectance.eval(si.uv, wavelengths, n_channels)
        fdr = self._fdr_int()
        if self.nonlinear:
            denom = 1.0 - diff * fdr
        else:
            denom = jnp.asarray(1.0 - fdr)[..., None] * jnp.ones_like(diff)
        inv_eta_2 = 1.0 / (self.eta * self.eta)
        value = (
            diff / jnp.maximum(denom, 1e-6)
            * (INV_PI * inv_eta_2 * cos_o * (1.0 - f_i) * (1.0 - f_o))[..., None]
        )
        return jnp.where(valid[..., None], value, 0.0)

    def pdf(self, si, wo):
        """Diffuse-lobe pdf weighted by its selection prob (plastic.cpp:308-325)."""
        cos_i = si.wi[..., 2]
        cos_o = wo[..., 2]
        valid = (cos_i > 0) & (cos_o > 0)
        _, _, prob_d = self._probs(cos_i)
        return jnp.where(valid, prob_d * warp.square_to_cosine_hemisphere_pdf(wo), 0.0)

    def sample(self, u_lobe, u2, si, wavelengths, n_channels):
        """plastic.cpp:212-274."""
        cos_i = si.wi[..., 2]
        valid = cos_i > 0
        f_i, prob_s, prob_d = self._probs(cos_i)
        pick_spec = u_lobe < prob_s

        wo_s = jnp.stack([-si.wi[..., 0], -si.wi[..., 1], si.wi[..., 2]], axis=-1)
        wo_d = warp.square_to_cosine_hemisphere(u2)
        wo = jnp.where(pick_spec[..., None], wo_s, wo_d)

        spec = self.specular_reflectance.eval(si.uv, wavelengths, n_channels)
        w_spec = spec * (f_i / jnp.maximum(prob_s, 1e-12))[..., None]

        f_o, _, _, _ = fresnel(wo[..., 2], self.eta)
        diff = self.diffuse_reflectance.eval(si.uv, wavelengths, n_channels)
        fdr = self._fdr_int()
        if self.nonlinear:
            denom = 1.0 - diff * fdr
        else:
            denom = jnp.asarray(1.0 - fdr)[..., None] * jnp.ones_like(diff)
        inv_eta_2 = 1.0 / (self.eta * self.eta)
        w_diff = (
            diff / jnp.maximum(denom, 1e-6)
            * (inv_eta_2 * (1.0 - f_i) * (1.0 - f_o) / jnp.maximum(prob_d, 1e-12))[..., None]
        )

        weight = jnp.where(pick_spec[..., None], w_spec, w_diff)
        weight = jnp.where(valid[..., None], weight, 0.0)
        pdf = jnp.where(
            pick_spec, prob_s, prob_d * warp.square_to_cosine_hemisphere_pdf(wo_d)
        )
        bs = BSDFSample(
            wo=wo,
            pdf=jnp.where(valid, pdf, 0.0),
            eta=jnp.ones_like(pdf),
            delta=pick_spec & valid,
        )
        return bs, weight
