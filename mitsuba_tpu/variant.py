"""Variant system: a frozen config instead of C++ template instantiation.

The reference instantiates every class per variant via codegen
(reference: resources/configure.py:17-80, mitsuba-default.conf:86-160).  Here a
variant is just a dataclass that fixes trace-time array shapes:

  color_mode: 'mono' (C=1) | 'rgb' (C=3) | 'spectral' (C=4 sampled wavelengths)
  polarized:  adds the Stokes axis (radiance [..., 4, C], throughput Mueller
              [..., 4, 4, C])

Reference variant names map onto these: e.g. 'scalar_rgb' and 'llvm_ad_rgb'
-> rgb; 'llvm_ad_mono_polarized' -> mono+polarized.  The scalar/llvm/cuda and
ad/non-ad distinctions disappear: everything is JAX (jit ≙ llvm/cuda,
grad ≙ ad) on TPU.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Variant:
    color_mode: str = "rgb"      # 'mono' | 'rgb' | 'spectral'
    polarized: bool = False

    @property
    def n_channels(self) -> int:
        return {"mono": 1, "rgb": 3, "spectral": 4}[self.color_mode]

    @property
    def is_spectral(self) -> bool:
        return self.color_mode == "spectral"

    @property
    def name(self) -> str:
        pol = "_polarized" if self.polarized else ""
        return f"{self.color_mode}{pol}"


_ALIASES = {
    "scalar_rgb": ("rgb", False),
    "scalar_mono": ("mono", False),
    "scalar_spectral": ("spectral", False),
    "scalar_spectral_polarized": ("spectral", True),
    "llvm_rgb": ("rgb", False),
    "llvm_ad_rgb": ("rgb", False),
    "llvm_ad_mono": ("mono", False),
    "llvm_mono": ("mono", False),
    "llvm_spectral": ("spectral", False),
    "llvm_ad_spectral": ("spectral", False),
    "llvm_ad_mono_polarized": ("mono", True),
    "llvm_ad_spectral_polarized": ("spectral", True),
    "cuda_ad_rgb": ("rgb", False),
    "mono": ("mono", False),
    "rgb": ("rgb", False),
    "spectral": ("spectral", False),
    "mono_polarized": ("mono", True),
    "rgb_polarized": ("rgb", True),
    "spectral_polarized": ("spectral", True),
}

_current = Variant()


def set_variant(*names: str) -> None:
    """Select the active variant (mirrors mi.set_variant,
    reference: src/python/__init__.py:175-287).  Accepts reference-style names;
    the first recognized one wins."""
    global _current
    for name in names:
        if name in _ALIASES:
            cm, pol = _ALIASES[name]
            _current = Variant(cm, pol)
            return
    raise ValueError(f"unknown variant(s) {names!r}; known: {sorted(_ALIASES)}")


def variant() -> str:
    return _current.name


def variants():
    return sorted(set(_ALIASES.keys()))


def current_variant() -> Variant:
    return _current
