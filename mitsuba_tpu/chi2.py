"""Chi-square goodness-of-fit harness for sample/pdf consistency
(reference: src/python/python/chi2.py:5-445).

Histograms ~1M directional samples over a (cos_theta, phi) grid and compares
against expected cell masses obtained by numerically integrating the pdf
(sub-sampled midpoint quadrature per cell, standing in for the reference's
adaptive quadrature), with Scheffe-Tukey low-count cell pooling and
significance level 0.01 (reference: chi2.py:240).  The p-value uses the
regularized upper incomplete gamma (jax.scipy.special.gammaincc).

Adapters mirror the reference's (chi2.py:446-620): BSDFAdapter,
PhaseFunctionAdapter, MicrofacetAdapter, SpectrumAdapter.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import gammaincc

from .core.rng import RNG


class ChiSquareTest:
    """sample_func(u1 [N], u2 [N,2]) -> directions [N,3];
    pdf_func(d [M,3]) -> densities (solid angle)."""

    def __init__(
        self,
        sample_func,
        pdf_func,
        sample_count=1_000_000,
        res_cos=32,
        res_phi=64,
        ires=8,
        significance_level=0.01,
        seed=0,
    ):
        self.sample_func = sample_func
        self.pdf_func = pdf_func
        self.sample_count = int(sample_count)
        self.res_cos = res_cos
        self.res_phi = res_phi
        self.ires = ires
        self.significance_level = significance_level
        self.seed = seed
        self.messages = ""

    def run(self):
        n = self.sample_count
        rng = RNG(self.seed, np.arange(n, dtype=np.uint32))
        u1, _, rng = rng.next_2d()
        a, b, _ = rng.next_2d()
        u2 = jnp.stack([a, b], axis=-1)
        out = self.sample_func(u1, u2)
        if isinstance(out, tuple):
            d, valid = np.asarray(out[0]), np.asarray(out[1])
        else:
            d, valid = np.asarray(out), None
        if valid is not None:
            # invalid samples (zero weight/pdf) are dropped, mirroring the
            # reference adapter; the pdf then integrates to the accept rate
            d = d[valid]
        valid_frac = 1.0 if valid is None else float(valid.mean())

        cos_t = np.clip(d[..., 2], -1.0, 1.0)
        phi = np.arctan2(d[..., 1], d[..., 0])  # [-pi, pi]
        i = np.clip(((cos_t + 1.0) * 0.5 * self.res_cos).astype(np.int64), 0, self.res_cos - 1)
        j = np.clip(((phi + np.pi) / (2 * np.pi) * self.res_phi).astype(np.int64), 0, self.res_phi - 1)
        hist = np.bincount(i * self.res_phi + j, minlength=self.res_cos * self.res_phi)
        hist = hist.reshape(self.res_cos, self.res_phi).astype(np.float64)

        # expected masses: tensor Gauss-Legendre per cell (stands in for the
        # reference's adaptive quadrature; GL handles peaked lobes far better
        # than midpoint sums)
        ct_edges = np.linspace(-1.0, 1.0, self.res_cos + 1)
        ph_edges = np.linspace(-np.pi, np.pi, self.res_phi + 1)
        dct = ct_edges[1] - ct_edges[0]
        dph = ph_edges[1] - ph_edges[0]

        def cell_masses(k):
            gx, gw = np.polynomial.legendre.leggauss(k)
            sub = 0.5 * (gx + 1.0)                  # nodes in (0,1)
            wsub = 0.5 * gw                         # weights summing to 1
            ct_c = ct_edges[:-1, None] + dct * sub[None, :]
            ph_c = ph_edges[:-1, None] + dph * sub[None, :]
            CT, PH = np.meshgrid(ct_c.reshape(-1), ph_c.reshape(-1), indexing="ij")
            ST = np.sqrt(np.maximum(1.0 - CT**2, 0.0))
            dirs = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], axis=-1)
            pdf = np.asarray(
                self.pdf_func(jnp.asarray(dirs.reshape(-1, 3), jnp.float32))
            ).astype(np.float64)
            pdf = pdf.reshape(self.res_cos, k, self.res_phi, k)
            w2 = wsub[None, :, None, None] * wsub[None, None, None, :]
            return (pdf * w2).sum(axis=(1, 3)) * dct * dph

        cell_mass = cell_masses(self.ires)
        cell_hi = cell_masses(self.ires * 2)
        # one refinement step: where the two estimates disagree, trust and
        # further refine the finer one
        disagree = np.abs(cell_hi - cell_mass) > 0.05 * np.maximum(cell_hi, 1e-12)
        cell_mass = cell_hi
        if disagree.any():
            cell_vhi = cell_masses(self.ires * 4)
            cell_mass = np.where(disagree, cell_vhi, cell_mass)
        expected = cell_mass * n

        # Scheffe-Tukey pooling of cells with expected < 5 (chi2.py pooling)
        obs = hist.reshape(-1)
        exp = expected.reshape(-1)
        order = np.argsort(exp)
        obs, exp = obs[order], exp[order]
        pooled_obs, pooled_exp = [], []
        acc_o = acc_e = 0.0
        for o, e in zip(obs, exp):
            acc_o += o
            acc_e += e
            if acc_e >= 5.0:
                pooled_obs.append(acc_o)
                pooled_exp.append(acc_e)
                acc_o = acc_e = 0.0
        if acc_e > 0 and pooled_exp:
            pooled_obs[-1] += acc_o
            pooled_exp[-1] += acc_e
        pooled_obs = np.asarray(pooled_obs)
        pooled_exp = np.asarray(pooled_exp)

        dof = len(pooled_obs) - 1
        chi2_stat = np.sum((pooled_obs - pooled_exp) ** 2 / np.maximum(pooled_exp, 1e-9))
        # survival function of chi2: Q(dof/2, x/2)
        p_value = float(gammaincc(dof / 2.0, chi2_stat / 2.0))

        self.p_value = p_value
        self.chi2_stat = float(chi2_stat)
        self.dof = dof
        total_expected = float(exp.sum())
        self.messages = (
            f"chi2={chi2_stat:.2f} dof={dof} p={p_value:.4f} "
            f"(expected mass {total_expected / n:.4f}, valid frac {valid_frac:.4f})"
        )
        # the pdf must integrate to the valid-sample fraction (catches
        # normalization bugs a shape-only chi2 can miss)
        norm_ok = abs(total_expected / n - valid_frac) < 0.02
        return (p_value >= self.significance_level) and norm_ok


# ---------------------------------------------------------------------------
# Adapters (reference: chi2.py:446-620)
# ---------------------------------------------------------------------------

def BSDFAdapter(bsdf, wi, n_channels=1):
    """Fixed incident direction; sample/pdf over outgoing directions."""
    from .render.records import SurfaceInteraction

    def sample_func(u1, u2):
        n = u1.shape[0]
        si = SurfaceInteraction.invalid(n).replace(
            wi=jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
        )
        bs, w = bsdf.sample(u1, u2, si, None, n_channels)
        valid = (bs.pdf > 0) & (jnp.max(w, axis=-1) > 0)
        return bs.wo, valid

    def pdf_func(d):
        n = d.shape[0]
        si = SurfaceInteraction.invalid(n).replace(
            wi=jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
        )
        return bsdf.pdf(si, d)

    return sample_func, pdf_func


def PhaseFunctionAdapter(phase, n_channels=1, mei_maker=None):
    """mei_maker(n) builds the MediumInteraction batch for phases that need
    position/frame context (e.g. sggx); None for direction-only phases."""
    def sample_func(u1, u2):
        mei = mei_maker(u1.shape[0]) if mei_maker is not None else None
        wo, _, _ = phase.sample(mei, u1, u2, None, n_channels)
        return wo

    def pdf_func(d):
        mei = mei_maker(d.shape[0]) if mei_maker is not None else None
        _, pdf = phase.eval_pdf(mei, d, None, n_channels)
        return pdf

    return sample_func, pdf_func


def MicrofacetAdapter(alpha, wi):
    from .render import microfacet as mf

    def sample_func(u1, u2):
        n = u1.shape[0]
        wi_b = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
        return mf.ggx_sample_vndf(wi_b, u2[..., 0], u2[..., 1], alpha, alpha)

    def pdf_func(d):
        n = d.shape[0]
        wi_b = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
        return mf.ggx_pdf_visible(wi_b, d, alpha, alpha)

    return sample_func, pdf_func


def WarpAdapter(warp_fn, pdf_fn):
    def sample_func(u1, u2):
        return warp_fn(u2)

    return sample_func, pdf_fn


def EmitterAdapter(scene, ref_p):
    """Scene-level NEE distribution test (reference: chi2.py:531-570
    EmitterAdapter): histogram `scene.sample_emitter_direction` against the
    pdf the MIS weights use (`pdf_emitter_direction_hit`/`_escaped`), from a
    fixed reference point.  Catches solid-angle-conversion and
    emitter-selection bugs that per-plugin chi2 can't see.  Delta emitters
    (point/directional) are excluded via the valid mask, as in the
    reference."""
    from .render.records import Ray

    ref = jnp.asarray(ref_p, jnp.float32)

    def sample_func(u1, u2):
        n = u1.shape[0]
        refs = jnp.broadcast_to(ref, (n, 3))
        ds, w = scene.sample_emitter_direction(
            refs, u1, u2, None, jnp.ones((n,), bool), test_visibility=False
        )
        return ds.d, (ds.pdf > 0) & ~ds.delta

    def pdf_func(d):
        n = d.shape[0]
        refs = jnp.broadcast_to(ref, (n, 3))
        si = scene.ray_intersect(Ray.make(refs, d), jnp.ones((n,), bool))
        pdf_hit = scene.pdf_emitter_direction_hit(refs, si)
        pdf_esc = scene.pdf_emitter_direction_escaped(d)
        return jnp.where(si.is_valid, pdf_hit, pdf_esc)

    return sample_func, pdf_func


def SpectrumAdapter(kind="visible"):
    """Wavelength importance-sampling test (reference: chi2.py:446-477
    SpectrumAdapter over a LineDomain): (sample, pdf, lo, hi) for
    ChiSquareTest1D.  'visible' is the CIE-luminance-shaped curve the
    renderer uses for hero-wavelength sampling (spectrum.h:sample_rgb_spectrum);
    'uniform' the flat fallback."""
    from .core import spectrum as spec

    if kind == "visible":
        # the analytic warp overshoots [360, 830] by <0.3nm at u -> 0/1;
        # clip into the pdf's support like the renderer's wavelength setup
        return (
            lambda u: jnp.clip(
                spec.sample_visible_wavelength(u), spec.CIE_MIN, spec.CIE_MAX
            ),
            lambda wl: spec.pdf_visible_wavelength(wl),
            360.0, 830.0,
        )
    if kind == "uniform":
        return (
            lambda u: spec.sample_uniform_wavelength(u),
            lambda wl: spec.pdf_uniform_wavelength(wl),
            float(spec.CIE_MIN), float(spec.CIE_MAX),
        )
    raise ValueError(f"unknown spectrum kind {kind!r}")


class ChiSquareTest1D:
    """1D analog of ChiSquareTest over an interval [lo, hi] (the reference's
    LineDomain, chi2.py SpectrumAdapter tests): histogram sampled scalars
    against the midpoint-quadrature-integrated pdf with the same
    Scheffe-Tukey pooling and significance level."""

    def __init__(self, sample_func, pdf_func, lo, hi, sample_count=200_000,
                 res=64, ires=16, significance_level=0.01, seed=0):
        self.sample_func = sample_func
        self.pdf_func = pdf_func
        self.lo = float(lo)
        self.hi = float(hi)
        self.sample_count = int(sample_count)
        self.res = res
        self.ires = ires
        self.significance_level = significance_level
        self.seed = seed
        self.messages = ""

    def run(self):
        n = self.sample_count
        rng = RNG(self.seed, np.arange(n, dtype=np.uint32))
        u, _, _ = rng.next_2d()
        x = np.asarray(self.sample_func(u))
        assert (x >= self.lo).all() and (x <= self.hi).all(), "sample out of domain"
        width = self.hi - self.lo
        i = np.clip(((x - self.lo) / width * self.res).astype(np.int64),
                    0, self.res - 1)
        hist = np.bincount(i, minlength=self.res).astype(np.float64)

        edges = np.linspace(self.lo, self.hi, self.res + 1)
        sub = (np.arange(self.ires) + 0.5) / self.ires
        pts = edges[:-1, None] + (width / self.res) * sub[None, :]
        pdf = np.asarray(self.pdf_func(jnp.asarray(pts.reshape(-1), jnp.float32)))
        pdf = pdf.reshape(self.res, self.ires).astype(np.float64)
        expected = pdf.mean(axis=1) * (width / self.res) * n

        obs, exp = _pool(hist, expected)
        dof = len(obs) - 1
        chi2_stat = np.sum((obs - exp) ** 2 / np.maximum(exp, 1e-9))
        p_value = float(gammaincc(dof / 2.0, chi2_stat / 2.0))
        self.p_value = p_value
        self.chi2_stat = float(chi2_stat)
        self.dof = dof
        total = float(expected.sum())
        self.messages = (
            f"chi2={chi2_stat:.2f} dof={dof} p={p_value:.4f} "
            f"(expected mass {total / n:.4f})"
        )
        return (p_value >= self.significance_level) and abs(total / n - 1.0) < 0.02


def _pool(obs, exp):
    """Scheffe-Tukey pooling of low-expectation cells (shared with the 2D
    harness's inline version)."""
    order = np.argsort(exp)
    obs, exp = obs.reshape(-1)[order], exp.reshape(-1)[order]
    pooled_obs, pooled_exp = [], []
    acc_o = acc_e = 0.0
    for o, e in zip(obs, exp):
        acc_o += o
        acc_e += e
        if acc_e >= 5.0:
            pooled_obs.append(acc_o)
            pooled_exp.append(acc_e)
            acc_o = acc_e = 0.0
    if acc_e > 0 and pooled_exp:
        pooled_obs[-1] += acc_o
        pooled_exp[-1] += acc_e
    return np.asarray(pooled_obs), np.asarray(pooled_exp)
