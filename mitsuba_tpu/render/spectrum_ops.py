"""Spectrum algebra abstraction: one integrator implementation serves both
unpolarized ([N, C] scalars) and polarized ([N, C, 4, 4] Mueller throughput,
[N, C, 4] Stokes radiance) variants.

This replaces the reference's template Spectrum type (Color<Float,C> vs
MuellerMatrix<Spectrum>, reference: mitsuba-default.conf:107-160) with a pair
of static ops objects selected at trace time by scene.polarized.
Composition follows the reference: throughput right-multiplies new events
(beta = beta @ M, reference: prb_polarized.py:279,302), contributions are
beta @ M_nee @ s_emit (prb_polarized.py:248).
"""
from __future__ import annotations

import jax.numpy as jnp


class ScalarOps:
    """Unpolarized: weights and radiance are [N, C]."""

    polarized = False

    @staticmethod
    def one(n, nc):
        return jnp.ones((n, nc), jnp.float32)

    @staticmethod
    def zero_radiance(n, nc):
        return jnp.zeros((n, nc), jnp.float32)

    @staticmethod
    def mul_scalar(beta, s):
        """Multiply throughput by a per-channel scalar weight [N, C]."""
        return beta * s

    @staticmethod
    def apply(beta, M):
        """Append an event weight to the throughput."""
        return beta * M

    @staticmethod
    def emit(beta, value):
        """Radiance contribution of emission `value` [N, C] through beta."""
        return beta * value

    @staticmethod
    def contrib_nee(beta, M_nee, value):
        """beta o M_nee o emission: NEE contribution."""
        return beta * M_nee * value

    @staticmethod
    def intensity_beta(beta):
        """Scalar intensity of the throughput (for RR)."""
        return beta

    @staticmethod
    def where_beta(mask, a, b):
        return jnp.where(mask[..., None], a, b)

    @staticmethod
    def where_rad(mask, a, b):
        return jnp.where(mask[..., None], a, b)


class MuellerOps:
    """Polarized: throughput [N, C, 4, 4] Mueller, radiance [N, C, 4] Stokes."""

    polarized = True

    @staticmethod
    def one(n, nc):
        return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n, nc, 4, 4))

    @staticmethod
    def zero_radiance(n, nc):
        return jnp.zeros((n, nc, 4), jnp.float32)

    @staticmethod
    def mul_scalar(beta, s):
        return beta * s[..., None, None]

    @staticmethod
    def apply(beta, M):
        return beta @ M

    @staticmethod
    def emit(beta, value):
        """Unpolarized emission: Stokes [value, 0, 0, 0] through beta =
        first column of beta times value."""
        return beta[..., :, 0] * value[..., None]

    @staticmethod
    def contrib_nee(beta, M_nee, value):
        s = (beta @ M_nee)[..., :, 0] * value[..., None]
        return s

    @staticmethod
    def intensity_beta(beta):
        return beta[..., 0, 0]

    @staticmethod
    def where_beta(mask, a, b):
        return jnp.where(mask[..., None, None, None], a, b)

    @staticmethod
    def where_rad(mask, a, b):
        return jnp.where(mask[..., None, None], a, b)


def get_ops(polarized: bool):
    return MuellerOps if polarized else ScalarOps


def depolarizer_weight(value):
    """[N, C] -> [N, C, 4, 4] ideal-depolarizer Mueller (mueller.h:37-42)."""
    m = jnp.zeros(value.shape + (4, 4), jnp.float32)
    return m.at[..., 0, 0].set(value)


def identity_weight(value):
    """[N, C] -> value * I4 (polarization-preserving scalar attenuation)."""
    return value[..., None, None] * jnp.eye(4, dtype=jnp.float32)
