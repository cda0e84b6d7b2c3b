"""Polarized phase-function plugins of the NASA fork: mie, tabphase_polarized,
blendphase (reference: src/phase/mie.cpp:57-316,
src/phase/tabphase_polarized.cpp:42-238, src/phase/blendphase.cpp).

Pipeline mirrors the reference's practice (SURVEY.md §3.5): the Mie series
cannot live in the rendering hot loop (the reference disables it inside
recorded megakernels, mie.cpp:252,272), so `{'type':'mie'}` is solved at
*scene-build time* over the size-distribution quadrature and baked into a
tabulated polarized phase (tabphase_polarized-equivalent HBM tables), which
is what the integrators consume.  MiePhase.eval_mie remains available for
direct/offline evaluation and tests.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..core.distr import IrregularContinuousDistribution
from . import mueller as mu
from .mie import mie, mie_nmax
from .phase import rotate_phase_mueller

TWO_PI = 2.0 * np.pi
INV_TWO_PI = 1.0 / TWO_PI


def eval_mie_distribution(mu_cos, wavelength, size_distr, ior_med, ior_sph, nmax):
    """<Mueller phase matrix> over a particle size distribution by
    Gauss-Legendre quadrature (reference: mie.cpp:152-211):

       M(mu) = sum_i w_i n(r_i) Cs_i M_i(mu) / sum_i w_i n(r_i) Cs_i

    mu_cos: [K] scattering-angle cosines (physics convention: +1 forward).
    Returns (M [K, 4, 4] scattering-plane basis, Cs_avg scalar, Ct_avg)."""
    radii, weights, sdf = size_distr.eval_gauss_all()      # [G]
    r_grid = radii[None, :]
    mu_grid = mu_cos[:, None]
    s1, s2, ns, cs, ct = mie(
        wavelength, mu_grid, r_grid, ior_med, ior_sph, nmax
    )  # [K, G]
    M = mu.mie_scatter(s1, s2, ns)                         # [K, G, 4, 4]
    w = (weights * sdf)[None, :]                           # [1, G]
    cs_w = w * cs
    Cs_avg = jnp.sum(cs_w, axis=1)                         # [K] (equal entries)
    M_avg = jnp.sum(cs_w[..., None, None] * M, axis=1) / Cs_avg[..., None, None]
    Ct_avg = jnp.sum(w * ct, axis=1)
    return M_avg, Cs_avg[0], Ct_avg[0]


@struct.dataclass
class TabPhasePolarized:
    """Tabulated polarized phase function for spherically symmetric particles
    (reference: src/phase/tabphase_polarized.cpp:42-238).

    Four tables M11, M12, M33, M34 over an irregular cos(theta) grid build the
    full Mueller matrix (:168-196); cos(theta) is inverse-CDF sampled from M11
    (:128); all four tables are differentiable scene parameters (:207-212).
    Physics convention: cos(theta)=+1 is forward scattering; in the fork's
    local medium frame (wi=(0,0,-1)) that is wo_z = +cos(theta)."""

    nodes: jnp.ndarray   # [K] cos(theta), ascending
    m11: jnp.ndarray     # [K] unnormalized phase (M11)
    m12: jnp.ndarray
    m33: jnp.ndarray
    m34: jnp.ndarray

    def _distr(self):
        return IrregularContinuousDistribution.create(self.nodes, self.m11)

    def _interp(self, table, x):
        i = jnp.clip(
            jnp.searchsorted(self.nodes, x, side="right", method="compare_all") - 1, 0, self.nodes.shape[0] - 2
        )
        x0 = self.nodes[i]
        x1 = self.nodes[i + 1]
        f = jnp.clip((x - x0) / jnp.maximum(x1 - x0, 1e-9), 0.0, 1.0)
        return table[i] * (1 - f) + table[i + 1] * f

    # -- unpolarized interface ---------------------------------------------
    def sample(self, mei, u1, u2, wavelengths, n_channels):
        d = self._distr()
        cos_theta = d.sample(u2[..., 1])
        pdf = d.eval_pdf_normalized(cos_theta) * INV_TWO_PI
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
        phi = TWO_PI * u2[..., 0]
        wo = jnp.stack(
            [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
        )
        weight = jnp.ones(wo.shape[:-1] + (n_channels,), jnp.float32)
        return wo, weight, pdf

    def eval_pdf(self, mei, wo, wavelengths, n_channels):
        d = self._distr()
        cos_theta = wo[..., 2]
        pdf = d.eval_pdf_normalized(cos_theta) * INV_TWO_PI
        return jnp.broadcast_to(pdf[..., None], pdf.shape + (n_channels,)), pdf

    # -- polarized interface -----------------------------------------------
    def eval_pdf_mueller(self, mei, wo, wavelengths, n_channels):
        d = self._distr()
        cos_theta = wo[..., 2]
        norm = INV_TWO_PI / d.integral
        m11 = self._interp(self.m11, cos_theta) * norm
        m12 = self._interp(self.m12, cos_theta) * norm
        m33 = self._interp(self.m33, cos_theta) * norm
        m34 = self._interp(self.m34, cos_theta) * norm
        z = jnp.zeros_like(m11)
        M = jnp.stack(
            [
                jnp.stack([m11, m12, z, z], axis=-1),
                jnp.stack([m12, m11, z, z], axis=-1),
                jnp.stack([z, z, m33, m34], axis=-1),
                jnp.stack([z, z, -m34, m33], axis=-1),
            ],
            axis=-2,
        )  # [N, 4, 4] (reference: tabphase_polarized.cpp:168-175)
        M = jnp.broadcast_to(M[..., None, :, :], M.shape[:-2] + (n_channels, 4, 4))
        wi_hat = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), wo.shape)
        M = rotate_phase_mueller(M, wo, wi_hat)
        pdf = self._interp(self.m11, cos_theta) / d.integral * INV_TWO_PI
        return M, pdf

    def parameters_changed(self):
        return self


@struct.dataclass
class MiePhase:
    """Lorenz-Mie phase over a size distribution (reference: src/phase/mie.cpp).
    Direct evaluation for tests/offline; rendering uses .bake()."""

    size_distr: object
    ior_med_re: jnp.ndarray
    ior_med_im: jnp.ndarray
    ior_sph_re: jnp.ndarray
    ior_sph_im: jnp.ndarray
    wavelength: jnp.ndarray     # bake wavelength (units consistent with radii)
    nmax: int = struct.field(pytree_node=False)

    def eval_mueller_mu(self, mu_cos):
        """[K] cosines -> ([K,4,4] scattering-plane Mueller, Cs_avg, Ct_avg)."""
        ior_med = self.ior_med_re + 1j * self.ior_med_im
        ior_sph = self.ior_sph_re + 1j * self.ior_sph_im
        return eval_mie_distribution(
            mu_cos, self.wavelength, self.size_distr, ior_med, ior_sph, self.nmax
        )

    def bake(self, n_nodes=256):
        """Solve the Mie series over a cos(theta) grid and bake a
        TabPhasePolarized (the reference's practical pipeline, SURVEY §3.5).

        The series is complex-valued and TPU backends lack complex support
        (a complex op faults the backend), so this setup-time solve is
        pinned to the host CPU backend; only the baked REAL tables move to
        the accelerator — exactly the reference's precompute-then-tabulate
        split (mie.cpp:252,272 disables Mie inside recorded kernels)."""
        cpu = jax.devices("cpu")[0]
        host = jax.device_put(self, cpu)
        with jax.default_device(cpu):
            nodes = jnp.linspace(-1.0, 1.0, n_nodes).astype(jnp.float32)
            M, _, _ = host.eval_mueller_mu(nodes)
        M = np.asarray(M)
        return TabPhasePolarized(
            nodes=jnp.asarray(np.linspace(-1.0, 1.0, n_nodes), jnp.float32),
            m11=jnp.asarray(M[:, 0, 0]),
            m12=jnp.asarray(M[:, 0, 1]),
            m33=jnp.asarray(M[:, 2, 2]),
            m34=jnp.asarray(M[:, 2, 3]),
        )


@struct.dataclass
class BlendPhase:
    """Convex combination of two phase functions
    (reference: src/phase/blendphase.cpp)."""

    phase_a: object
    phase_b: object
    weight: jnp.ndarray   # weight of phase_b

    def sample(self, mei, u1, u2, wavelengths, n_channels):
        wo_a, w_a, pdf_a = self.phase_a.sample(mei, u1, u2, wavelengths, n_channels)
        wo_b, w_b, pdf_b = self.phase_b.sample(mei, u1, u2, wavelengths, n_channels)
        pick_b = u1 < self.weight
        wo = jnp.where(pick_b[..., None], wo_b, wo_a)
        val, pdf = self.eval_pdf(mei, wo, wavelengths, n_channels)
        weight = val / jnp.maximum(pdf, 1e-12)[..., None]
        return wo, weight, pdf

    def eval_pdf(self, mei, wo, wavelengths, n_channels):
        va, pa = self.phase_a.eval_pdf(mei, wo, wavelengths, n_channels)
        vb, pb = self.phase_b.eval_pdf(mei, wo, wavelengths, n_channels)
        w = self.weight
        return (1 - w) * va + w * vb, (1 - w) * pa + w * pb

    def eval_pdf_mueller(self, mei, wo, wavelengths, n_channels):
        from .spectrum_ops import depolarizer_weight

        if hasattr(self.phase_a, "eval_pdf_mueller"):
            Ma, pa = self.phase_a.eval_pdf_mueller(mei, wo, wavelengths, n_channels)
        else:
            va, pa = self.phase_a.eval_pdf(mei, wo, wavelengths, n_channels)
            Ma = depolarizer_weight(va)
        if hasattr(self.phase_b, "eval_pdf_mueller"):
            Mb, pb = self.phase_b.eval_pdf_mueller(mei, wo, wavelengths, n_channels)
        else:
            vb, pb = self.phase_b.eval_pdf(mei, wo, wavelengths, n_channels)
            Mb = depolarizer_weight(vb)
        w = self.weight
        return (1 - w) * Ma + w * Mb, (1 - w) * pa + w * pb

    def parameters_changed(self):
        return self


def parse_polarized_phase(spec, param_paths, phase_prefix, phase_path_root):
    t = spec["type"]
    if t == "tabphase_polarized":
        vals = {}
        for k in ("m11", "m12", "m33", "m34"):
            v = spec.get(k, spec.get(f"values_{k}"))
            if isinstance(v, str):
                v = [float(x) for x in v.split(",")]
            vals[k] = np.asarray(v if v is not None else [1.0, 1.0], np.float32)
        knodes = spec.get("nodes")
        if knodes is None:
            knodes = np.linspace(-1.0, 1.0, vals["m11"].shape[0])
        for k in ("m11", "m12", "m33", "m34"):
            param_paths.append((f"{phase_prefix}.{k}", phase_path_root + (k,)))
        return TabPhasePolarized(
            nodes=jnp.asarray(knodes, jnp.float32),
            m11=jnp.asarray(vals["m11"]),
            m12=jnp.asarray(vals["m12"]),
            m33=jnp.asarray(vals["m33"]),
            m34=jnp.asarray(vals["m34"]),
        )
    if t == "mie":
        from .sizedistr import parse_sizedistr

        sd_spec = spec.get("size_distr", spec.get("sizedistr"))
        if sd_spec is None:
            for v in spec.values():
                if isinstance(v, dict) and v.get("type") in (
                    "monodisperse", "gamma", "lognormal", "powerlaw",
                ):
                    sd_spec = v
                    break
        sd = parse_sizedistr(sd_spec)
        wl = float(spec.get("wavelength", 550.0))
        ior_med = complex(spec.get("ior_med", 1.0))
        ior_sph = complex(spec.get("ior_sph", 1.33))
        radii = np.asarray(sd.eval_gauss_all()[0])
        # series length from the largest size parameter (mie.h:76-80)
        y_max = 2 * np.pi * float(radii.max()) / wl * max(abs(ior_med), abs(ior_sph))
        nmax = int(spec.get("nmax", -1))
        if nmax <= 0:
            nmax = mie_nmax(y_max)
        mp = MiePhase(
            size_distr=sd,
            ior_med_re=jnp.asarray(ior_med.real, jnp.float32),
            ior_med_im=jnp.asarray(ior_med.imag, jnp.float32),
            ior_sph_re=jnp.asarray(ior_sph.real, jnp.float32),
            ior_sph_im=jnp.asarray(ior_sph.imag, jnp.float32),
            wavelength=jnp.asarray(wl, jnp.float32),
            nmax=nmax,
        )
        # bake for rendering (reference practice: precompute Mie -> tabulated)
        baked = mp.bake(int(spec.get("bake_nodes", 256)))
        for k in ("m11", "m12", "m33", "m34"):
            param_paths.append((f"{phase_prefix}.{k}", phase_path_root + (k,)))
        return baked
    if t == "blendphase":
        from .media import parse_phase

        nested = [
            v for v in spec.values()
            if isinstance(v, dict) and v.get("type") in (
                "isotropic", "hg", "rayleigh", "mie", "tabphase", "tabphase_polarized",
            )
        ]
        if len(nested) != 2:
            raise ValueError("blendphase needs exactly two nested phases")
        pa = parse_phase(nested[0], param_paths, phase_prefix + ".a", phase_path_root + ("phase_a",))
        pb = parse_phase(nested[1], param_paths, phase_prefix + ".b", phase_path_root + ("phase_b",))
        return BlendPhase(
            phase_a=pa, phase_b=pb,
            weight=jnp.asarray(float(spec.get("weight", 0.5)), jnp.float32),
        )
    raise ValueError(f"unknown polarized phase type {t!r}")
