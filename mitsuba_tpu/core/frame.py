"""Orthonormal shading frames and basic vector math.

TPU-native equivalent of the reference's Frame3f (reference:
include/mitsuba/core/frame.h) and vector helpers.  All functions operate on
trailing-dim-3 float arrays and broadcast over leading (wavefront) axes.
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def norm(v, keepdims=False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 1e-30))


def normalize(v):
    return v / norm(v, keepdims=True)


def coordinate_system(n):
    """Build an orthonormal basis (s, t) around unit normal n.

    Branchless Duff et al. 2017 construction — same algorithm as the
    reference's mi::coordinate_system (include/mitsuba/core/frame.h / vector.h).
    """
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


class Frame:
    """Shading frame: local +z is the normal.  Functional pytree-free struct:
    just a namespace of (s, t, n) arrays; use the free functions below inside
    jitted code."""

    __slots__ = ("s", "t", "n")

    def __init__(self, n, s=None, t=None):
        if s is None:
            s, t = coordinate_system(n)
        self.s, self.t, self.n = s, t, n

    def to_local(self, v):
        return jnp.stack([dot(v, self.s), dot(v, self.t), dot(v, self.n)], axis=-1)

    def to_world(self, v):
        return (
            v[..., 0:1] * self.s + v[..., 1:2] * self.t + v[..., 2:3] * self.n
        )

    @staticmethod
    def cos_theta(v):
        return v[..., 2]

    @staticmethod
    def sin_theta_2(v):
        return jnp.maximum(1.0 - v[..., 2] * v[..., 2], 0.0)

    @staticmethod
    def sin_theta(v):
        return jnp.sqrt(Frame.sin_theta_2(v))


def frame_to_local(n, s, t, v):
    return jnp.stack([dot(v, s), dot(v, t), dot(v, n)], axis=-1)


def frame_to_world(n, s, t, v):
    return v[..., 0:1] * s + v[..., 1:2] * t + v[..., 2:3] * n


def reflect(wi):
    """Local-frame mirror reflection (reference: include/mitsuba/render/fresnel.h)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def refract_local(wi, cos_theta_t, eta_ti):
    """Local-frame refraction given precomputed transmitted cosine.
    Mirrors mi::refract (include/mitsuba/render/fresnel.h:~260)."""
    return jnp.stack(
        [-eta_ti * wi[..., 0], -eta_ti * wi[..., 1], cos_theta_t], axis=-1
    )
