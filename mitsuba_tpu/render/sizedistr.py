"""Particle size distributions — the fork's new plugin type
(reference: include/mitsuba/render/sizedistr.h:14-137,
src/render/sizedistr.cpp:7-48, src/sizedistrs/*.cpp).

Each distribution precomputes Gauss-Legendre nodes/weights scaled to
[min_radius, max_radius] (sizedistr.cpp:12-24) and a normalization constant
by quadrature (sizedistr.cpp:28-47).  `a`/`b`/`exponent`/... are
differentiable parameters (reference: gamma.cpp traverse); the normalization
is recomputed in parameters_changed (sizedistr.h:106-108)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..core.quad import gauss_legendre_interval


def _gauss(min_radius, max_radius, n):
    return gauss_legendre_interval(n, float(min_radius), float(max_radius))


@struct.dataclass
class MonodisperseSizeDistr:
    """Single radius (reference: src/sizedistrs/monodisperse.cpp)."""

    radius: jnp.ndarray

    is_monodisperse = True
    n_gauss = 1

    def eval_gauss_all(self):
        r = jnp.reshape(self.radius, (1,))
        return r, jnp.ones((1,), jnp.float32), jnp.ones((1,), jnp.float32)

    def parameters_changed(self):
        return self


def _normalize(nodes, weights, eval_fn):
    vals = eval_fn(nodes)
    return 1.0 / jnp.sum(weights * vals)


@struct.dataclass
class GammaSizeDistr:
    """n(r) = C r^((1-3b)/b) exp(-r/(a b)) (reference: gamma.cpp:45-51)."""

    a: jnp.ndarray
    b: jnp.ndarray
    normalization: jnp.ndarray
    gauss_nodes: jnp.ndarray
    gauss_weights: jnp.ndarray

    is_monodisperse = False

    @property
    def n_gauss(self):
        return self.gauss_nodes.shape[0]

    @staticmethod
    def create(a, b, min_radius, max_radius, n_gauss=100):
        nodes, weights = _gauss(min_radius, max_radius, n_gauss)
        d = GammaSizeDistr(
            a=jnp.asarray(a, jnp.float32), b=jnp.asarray(b, jnp.float32),
            normalization=jnp.asarray(1.0, jnp.float32),
            gauss_nodes=nodes, gauss_weights=weights,
        )
        return d.parameters_changed()

    def eval_unnormalized(self, r):
        return jnp.power(r, (1.0 - 3.0 * self.b) / self.b) * jnp.exp(
            -r / (self.a * self.b)
        )

    def eval(self, r):
        return self.normalization * self.eval_unnormalized(r)

    def eval_gauss_all(self):
        """(radii, quadrature weights, normalized density values)
        (reference: sizedistr.h:69-83 eval_gauss_all)."""
        return self.gauss_nodes, self.gauss_weights, self.eval(self.gauss_nodes)

    def parameters_changed(self):
        return self.replace(
            normalization=_normalize(
                self.gauss_nodes, self.gauss_weights, self.eval_unnormalized
            )
        )


@struct.dataclass
class LogNormalSizeDistr:
    """n(r) = C exp(-(ln r - ln r_m)^2 / (2 ln^2 sigma)) / r
    (reference: lognormal.cpp)."""

    mean_radius: jnp.ndarray
    std: jnp.ndarray
    normalization: jnp.ndarray
    gauss_nodes: jnp.ndarray
    gauss_weights: jnp.ndarray

    is_monodisperse = False

    @property
    def n_gauss(self):
        return self.gauss_nodes.shape[0]

    @staticmethod
    def create(mean_radius, std, min_radius, max_radius, n_gauss=100):
        nodes, weights = _gauss(min_radius, max_radius, n_gauss)
        d = LogNormalSizeDistr(
            mean_radius=jnp.asarray(mean_radius, jnp.float32),
            std=jnp.asarray(std, jnp.float32),
            normalization=jnp.asarray(1.0, jnp.float32),
            gauss_nodes=nodes, gauss_weights=weights,
        )
        return d.parameters_changed()

    def eval_unnormalized(self, r):
        a = jnp.log(r) - jnp.log(self.mean_radius)
        c = 1.0 / (2.0 * jnp.log(self.std) ** 2)
        return jnp.exp(-a * a * c) / r

    def eval(self, r):
        return self.normalization * self.eval_unnormalized(r)

    def eval_gauss_all(self):
        return self.gauss_nodes, self.gauss_weights, self.eval(self.gauss_nodes)

    def parameters_changed(self):
        return self.replace(
            normalization=_normalize(
                self.gauss_nodes, self.gauss_weights, self.eval_unnormalized
            )
        )


@struct.dataclass
class PowerLawSizeDistr:
    """n(r) = C r^-e (reference: powerlaw.cpp)."""

    exponent: jnp.ndarray
    normalization: jnp.ndarray
    gauss_nodes: jnp.ndarray
    gauss_weights: jnp.ndarray

    is_monodisperse = False

    @property
    def n_gauss(self):
        return self.gauss_nodes.shape[0]

    @staticmethod
    def create(exponent, min_radius, max_radius, n_gauss=100):
        nodes, weights = _gauss(min_radius, max_radius, n_gauss)
        d = PowerLawSizeDistr(
            exponent=jnp.asarray(exponent, jnp.float32),
            normalization=jnp.asarray(1.0, jnp.float32),
            gauss_nodes=nodes, gauss_weights=weights,
        )
        return d.parameters_changed()

    def eval_unnormalized(self, r):
        return jnp.power(r, -self.exponent)

    def eval(self, r):
        return self.normalization * self.eval_unnormalized(r)

    def eval_gauss_all(self):
        return self.gauss_nodes, self.gauss_weights, self.eval(self.gauss_nodes)

    def parameters_changed(self):
        return self.replace(
            normalization=_normalize(
                self.gauss_nodes, self.gauss_weights, self.eval_unnormalized
            )
        )


def parse_sizedistr(spec, param_paths=None, prefix=None, path_root=None):
    """Parse a size-distribution spec dict (plugin names: monodisperse, gamma,
    lognormal, powerlaw; reference: src/sizedistrs/)."""
    if spec is None:
        spec = {"type": "monodisperse"}
    t = spec["type"]
    min_r = float(spec.get("min_radius", 500.0))
    max_r = float(spec.get("max_radius", 5000.0))
    g = int(spec.get("gauss_points", 100))

    def reg(key, sub):
        if param_paths is not None and prefix is not None:
            param_paths.append((f"{prefix}.{key}", path_root + (sub,)))

    if t == "monodisperse":
        d = MonodisperseSizeDistr(radius=jnp.asarray(float(spec.get("radius", min_r)), jnp.float32))
        reg("radius", "radius")
        return d
    if t == "gamma":
        d = GammaSizeDistr.create(
            spec.get("a", 1000.0), spec.get("b", 0.25), min_r, max_r, g
        )
        reg("a", "a")
        reg("b", "b")
        return d
    if t == "lognormal":
        d = LogNormalSizeDistr.create(
            spec.get("mean_radius", 1000.0), spec.get("std", 100.0), min_r, max_r, g
        )
        reg("mean_radius", "mean_radius")
        reg("std", "std")
        return d
    if t == "powerlaw":
        d = PowerLawSizeDistr.create(spec.get("exponent", 3.0), min_r, max_r, g)
        reg("exponent", "exponent")
        return d
    raise ValueError(f"unknown size distribution type {t!r}")
