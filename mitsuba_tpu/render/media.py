"""Participating media (reference: src/media/{homogeneous,heterogeneous}.cpp,
include/mitsuba/render/medium.h).

API mirrors the reference Medium virtuals (medium.h:17-30):
  * get_majorant(p) -> [N] combined free-flight majorant
  * get_scattering_coefficients(p) -> (sigma_s, sigma_n, sigma_t), each [N, C],
    with sigma_n = majorant - sigma_t (null-scattering density)
  * intersect_aabb(ray) -> (mint, maxt, valid) slab test
    (reference: include/mitsuba/core/bbox.h ray_intersect)

Free-flight *sampling* (delta tracking) lives in the volpath integrators: the
reference's Medium::sample_interaction (medium.cpp:40-86) performs one
majorant-exponential step per integrator loop iteration; we inline that step
into the lax.while_loop.  The two-state APIs for recursive control variates
(medium.h:68-102) are realized functionally: integrators simply evaluate the
medium pytree at a previous parameter state.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from .volumes import ConstVolume, GridVolume, parse_volume


def intersect_aabb(ray, bbox_min, bbox_max):
    """Slab test (reference: bbox.h ray_intersect used by Medium::intersect_aabb)."""
    inv_d = 1.0 / jnp.where(jnp.abs(ray.d) < 1e-12, jnp.where(ray.d >= 0, 1e-12, -1e-12), ray.d)
    t0 = (bbox_min - ray.o) * inv_d
    t1 = (bbox_max - ray.o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    valid = tmax >= jnp.maximum(tmin, 0.0)
    return jnp.maximum(tmin, 0.0), tmax, valid


@struct.dataclass
class HomogeneousMedium:
    """(reference: src/media/homogeneous.cpp)."""

    sigma_t: object          # volume (ConstVolume) [C]
    albedo: object           # volume [C]
    scale: jnp.ndarray
    phase_index: int = struct.field(pytree_node=False)
    is_homogeneous = True
    has_spectral_extinction = True

    def get_majorant(self, p, n_channels):
        st = self.sigma_t.eval(p, n_channels) * self.scale
        return jnp.max(st, axis=-1)

    def get_majorant_spectrum(self, p, n_channels):
        """Per-channel free-flight majorant — for homogeneous media this is
        sigma_t itself (reference: homogeneous.cpp uses the spectral sigma_t
        as combined_extinction), which makes hero-channel tracking analog in
        its own channel while the exp(-(maj_j - maj_h) dt) ratio weights
        carry the other channels exactly."""
        return self.sigma_t.eval(p, n_channels) * self.scale

    def get_scattering_coefficients(self, p, n_channels):
        st = self.sigma_t.eval(p, n_channels) * self.scale
        al = self.albedo.eval(p, n_channels)
        ss = st * al
        maj = jnp.max(st, axis=-1, keepdims=True)
        sn = jnp.maximum(maj - st, 0.0)
        return ss, sn, st

    def intersect_aabb(self, ray):
        n = ray.o.shape[0]
        return (
            jnp.zeros((n,), jnp.float32),
            jnp.full((n,), jnp.inf, jnp.float32),
            jnp.ones((n,), bool),
        )

    def parameters_changed(self):
        return self


@struct.dataclass
class HeterogeneousMedium:
    """Gridded medium with constant majorant = scale * max(sigma_t)
    (reference: src/media/heterogeneous.cpp:163,180-199)."""

    sigma_t: object          # GridVolume (usually [D,H,W,1])
    albedo: object           # volume
    scale: jnp.ndarray
    max_density: jnp.ndarray  # precomputed scale * max(sigma_t)
    phase_index: int = struct.field(pytree_node=False)
    is_homogeneous = False
    has_spectral_extinction = True

    def get_majorant(self, p, n_channels):
        return jnp.broadcast_to(self.max_density, p.shape[:-1])

    def get_majorant_spectrum(self, p, n_channels):
        """Constant scalar majorant replicated per channel (reference:
        heterogeneous.cpp:163 scale*max over both grid and channels)."""
        return jnp.broadcast_to(self.max_density, p.shape[:-1] + (n_channels,))

    def get_scattering_coefficients(self, p, n_channels):
        st = self.sigma_t.eval(p, n_channels) * self.scale
        al = self.albedo.eval(p, n_channels)
        ss = st * al
        sn = jnp.maximum(self.max_density - st, 0.0)
        return ss, sn, st

    def intersect_aabb(self, ray):
        bb_min = getattr(self.sigma_t, "bbox_min", None)
        if bb_min is None:
            n = ray.o.shape[0]
            return (
                jnp.zeros((n,), jnp.float32),
                jnp.full((n,), jnp.inf, jnp.float32),
                jnp.ones((n,), bool),
            )
        return intersect_aabb(ray, self.sigma_t.bbox_min, self.sigma_t.bbox_max)

    def parameters_changed(self):
        """Recompute the majorant after sigma_t/scale edits
        (reference: heterogeneous.cpp:176-178 parameters_changed)."""
        return self.replace(max_density=self.scale * self.sigma_t.max() * 1.0001)


def transmittance_eval_pdf(mi_t, si_t, mint, combined_extinction):
    """Transmittance + free-flight pdf of a sampled medium interaction
    (reference: src/render/medium.cpp:101-111 Medium::transmittance_eval_pdf).
    The pdf accounts for whether the ray scattered (mi_t <= si_t) or left the
    medium; both are spectral [.., C]."""
    t = (jnp.minimum(mi_t, si_t) - mint)[..., None]
    tr = jnp.exp(-t * combined_extinction)
    pdf = jnp.where((si_t < mi_t)[..., None], tr, tr * combined_extinction)
    return tr, pdf


@struct.dataclass
class TwoStateMedium:
    """Two-state medium for recursive control variates (the fork's
    medium.h:68-102 sample_interaction_twostates / transmittance_eval_pdf_old
    hooks).  JAX realization: hold the *old* parameter state as a second
    medium pytree; `*_old` queries evaluate it.  `TwoStateMedium.wrap(m)`
    reproduces the reference default (old == current, medium.cpp:91-122
    passthrough)."""

    current: object
    old: object

    # -- current-state delegation ---------------------------------------
    @property
    def is_homogeneous(self):
        return self.current.is_homogeneous

    @property
    def has_spectral_extinction(self):
        return self.current.has_spectral_extinction

    @property
    def phase_index(self):
        return self.current.phase_index

    def get_majorant(self, p, n_channels):
        return self.current.get_majorant(p, n_channels)

    def get_majorant_spectrum(self, p, n_channels):
        return self.current.get_majorant_spectrum(p, n_channels)

    def get_scattering_coefficients(self, p, n_channels):
        return self.current.get_scattering_coefficients(p, n_channels)

    def intersect_aabb(self, ray):
        return self.current.intersect_aabb(ray)

    def parameters_changed(self):
        return self.replace(current=self.current.parameters_changed())

    # -- old-state queries ------------------------------------------------
    def get_scattering_coefficients_old(self, p, n_channels):
        """(reference: medium_v.cpp get_scattering_coefficients_old)."""
        return self.old.get_scattering_coefficients(p, n_channels)

    def transmittance_eval_pdf(self, mi_t, si_t, mint, p, n_channels):
        _, _, st = self.current.get_scattering_coefficients(p, n_channels)
        return transmittance_eval_pdf(mi_t, si_t, mint, st)

    def transmittance_eval_pdf_old(self, mi_t, si_t, mint, p, n_channels):
        """(reference: medium.cpp:114-122 — default passthrough; evaluates
        the stored old state here)."""
        _, _, st = self.old.get_scattering_coefficients(p, n_channels)
        return transmittance_eval_pdf(mi_t, si_t, mint, st)

    @staticmethod
    def wrap(medium, old=None):
        return TwoStateMedium(current=medium, old=old if old is not None else medium)


def _is_registered(category, t):
    """True if t names a user-registered plugin of category (plugin_registry)."""
    if t is None:
        return False
    from .. import plugin_registry as PR

    return PR.lookup(category, t) is not None


def parse_phase(spec, param_paths, phase_prefix, phase_path_root):
    """Parse a phase-function spec into an instance + registered params."""
    from . import phase as PH

    if spec is None:
        spec = {"type": "isotropic"}
    t = spec["type"]
    if t == "isotropic":
        return PH.IsotropicPhase()
    if t == "hg":
        g = float(spec.get("g", 0.8))
        param_paths.append((f"{phase_prefix}.g", phase_path_root + ("g",)))
        return PH.HGPhase(g=jnp.asarray(g, jnp.float32))
    if t == "rayleigh":
        rho = float(spec.get("depolarization", spec.get("rho", 0.0)))
        return PH.RayleighPhase(rho=jnp.asarray(rho, jnp.float32))
    if t == "tabphase":
        values = np.asarray(spec["values"], np.float32) if not isinstance(spec.get("values"), str) else np.asarray(
            [float(x) for x in spec["values"].split(",")], np.float32
        )
        nodes = np.linspace(-1.0, 1.0, values.shape[0]).astype(np.float32)
        param_paths.append((f"{phase_prefix}.values", phase_path_root + ("values",)))
        return PH.TabulatedPhase(nodes=jnp.asarray(nodes), values=jnp.asarray(values))
    if t == "sggx":
        from .volumes import parse_volume

        vol, leaf = parse_volume(spec.get("S", [1.0, 1.0, 1.0, 0.0, 0.0, 0.0]), 6)
        param_paths.append(
            (f"{phase_prefix}.S.{leaf}", phase_path_root + ("S", leaf))
        )
        return PH.SGGXPhase(S=vol)
    if t in ("mie", "tabphase_polarized", "blendphase"):
        from .phase_polarized import parse_polarized_phase

        return parse_polarized_phase(spec, param_paths, phase_prefix, phase_path_root)
    from .. import plugin_registry as PR

    if PR.lookup("phase", t) is not None:
        out, _ = PR.construct("phase", t, spec)
        if isinstance(out, dict):
            return parse_phase(out, param_paths, phase_prefix, phase_path_root)
        tp = getattr(out, "traverse_paths", None)
        if tp is not None:
            for suffix, attr_path in tp():
                param_paths.append(
                    (f"{phase_prefix}.{suffix}", phase_path_root + tuple(attr_path))
                )
        return out
    raise ValueError(f"unknown phase type {t!r}")


def parse_medium(spec, name, phase_list, param_paths, medium_index):
    """Parse a medium spec; registers its phase function in phase_list."""
    t = spec["type"]
    phase_spec = spec.get("phase")
    if phase_spec is None:
        for v in spec.values():
            if isinstance(v, dict) and (
                v.get("type") in (
                    "isotropic", "hg", "rayleigh", "mie", "tabphase",
                    "tabphase_polarized", "blendphase", "sggx",
                )
                or _is_registered("phase", v.get("type"))
            ):
                phase_spec = v
                break
    phase_index = len(phase_list)
    pp_mark = len(param_paths)   # rollback point if a user medium expands
    phase = parse_phase(
        phase_spec, param_paths, f"{name}.phase_function",
        ("phases", phase_index),
    )
    phase_list.append(phase)

    scale = jnp.asarray(float(spec.get("scale", 1.0)), jnp.float32)
    if t == "homogeneous":
        st, st_leaf = parse_volume(spec.get("sigma_t", 1.0), 3)
        al, al_leaf = parse_volume(spec.get("albedo", 0.75), 3)
        param_paths.append(
            (f"{name}.sigma_t.value.value", ("media", medium_index, "sigma_t", st_leaf))
        )
        param_paths.append(
            (f"{name}.albedo.value.value", ("media", medium_index, "albedo", al_leaf))
        )
        param_paths.append((f"{name}.scale", ("media", medium_index, "scale")))
        return HomogeneousMedium(
            sigma_t=st, albedo=al, scale=scale, phase_index=phase_index
        )
    if t == "heterogeneous":
        st, st_leaf = parse_volume(spec.get("sigma_t", 1.0), 3)
        al, al_leaf = parse_volume(spec.get("albedo", 0.75), 3)
        max_density = scale * st.max() * 1.0001
        param_paths.append(
            (f"{name}.sigma_t.{st_leaf}", ("media", medium_index, "sigma_t", st_leaf))
        )
        param_paths.append(
            (f"{name}.albedo.{al_leaf}", ("media", medium_index, "albedo", al_leaf))
        )
        param_paths.append((f"{name}.scale", ("media", medium_index, "scale")))
        return HeterogeneousMedium(
            sigma_t=st, albedo=al, scale=scale, max_density=max_density,
            phase_index=phase_index,
        )
    from .. import plugin_registry as PR

    if PR.lookup("medium", t) is not None:
        # object-returning constructors need the index of the phase slot the
        # loader reserved (Scene.medium_phase_of dispatches through it)
        spec = dict(spec)
        spec["_phase_index"] = phase_index
        out, _ = PR.construct("medium", t, spec)
        if isinstance(out, dict):
            # expansion re-parses; drop the speculative phase slot AND the
            # param paths the speculative parse_phase registered (they may
            # reference fields the expanded medium's phase doesn't have)
            del phase_list[phase_index]
            del param_paths[pp_mark:]
            return parse_medium(out, name, phase_list, param_paths, medium_index)
        tp = getattr(out, "traverse_paths", None)
        if tp is not None:
            for suffix, attr_path in tp():
                param_paths.append(
                    (f"{name}.{suffix}", ("media", medium_index) + tuple(attr_path))
                )
        return out
    raise ValueError(f"unknown medium type {t!r}")
