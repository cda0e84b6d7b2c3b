"""Wavefront interaction records (reference: include/mitsuba/render/interaction.h,
records.h).  SoA layout: every field is an array with leading wavefront axis [N].

Design: frozen flax.struct dataclasses = JAX pytrees.  Masked lanes carry
well-defined inert values (t=inf, zeros) instead of garbage so downstream math
stays NaN-free without branches.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.frame import coordinate_system, dot, frame_to_local, frame_to_world
from ..core.math import RAY_EPSILON


@struct.dataclass
class Ray:
    """o + t*d, t in [0, maxt] (reference: include/mitsuba/core/ray.h)."""

    o: jnp.ndarray          # [N, 3]
    d: jnp.ndarray          # [N, 3] normalized
    maxt: jnp.ndarray       # [N]

    @staticmethod
    def make(o, d, maxt=None):
        if maxt is None:
            maxt = jnp.full(o.shape[:-1], jnp.inf, o.dtype)
        return Ray(o=o, d=d, maxt=maxt)

    def at(self, t):
        return self.o + t[..., None] * self.d


def spawn_ray(p, n, d, maxt=None):
    """Offset ray origin along the geometric normal to avoid self-intersection
    (reference: interaction.h spawn_ray / offset_p)."""
    sign = jnp.sign(dot(n, d, keepdims=True))
    o = p + sign * RAY_EPSILON * n + RAY_EPSILON * d
    if maxt is None:
        maxt = jnp.full(p.shape[:-1], jnp.inf, p.dtype)
    return Ray(o=o, d=d, maxt=maxt)


@struct.dataclass
class PreliminaryIntersection:
    """Deferred-shading hit record (reference: interaction.h
    PreliminaryIntersection): just (t, prim, uv); the full SurfaceInteraction
    is computed once per bounce after the closest-hit reduction."""

    t: jnp.ndarray          # [N], inf = miss
    prim_index: jnp.ndarray  # [N] global primitive id (tris then spheres)
    prim_uv: jnp.ndarray    # [N, 2] barycentrics / sphere params

    @property
    def is_valid(self):
        return jnp.isfinite(self.t)


@struct.dataclass
class SurfaceInteraction:
    """Shaded surface hit (reference: interaction.h SurfaceInteraction).
    wi is stored in the *local* shading frame, as in the reference."""

    t: jnp.ndarray          # [N]
    p: jnp.ndarray          # [N, 3]
    n: jnp.ndarray          # [N, 3] geometric normal
    sh_n: jnp.ndarray       # [N, 3] shading normal (frame z)
    sh_s: jnp.ndarray       # [N, 3] shading tangent (frame x)
    sh_t: jnp.ndarray       # [N, 3] shading bitangent (frame y)
    uv: jnp.ndarray         # [N, 2]
    wi: jnp.ndarray         # [N, 3] incident dir in local frame (toward origin)
    shape_index: jnp.ndarray  # [N] int32, -1 = none
    prim_index: jnp.ndarray   # [N] int32
    # raw primitive barycentric (b1, b2) — uv above is the *interpolated*
    # texture UV; mesh_attribute textures need the barycentrics
    # (reference: interaction.h prim_uv usage in mesh_attribute.cpp)
    prim_uv: jnp.ndarray = None   # [N, 2]

    @property
    def is_valid(self):
        return jnp.isfinite(self.t)

    def to_local(self, v):
        return frame_to_local(self.sh_n, self.sh_s, self.sh_t, v)

    def to_world(self, v):
        return frame_to_world(self.sh_n, self.sh_s, self.sh_t, v)

    def to_world_mat3(self):
        """[..., 3, 3] with frame s/t/n as columns (local->world)."""
        return jnp.stack([self.sh_s, self.sh_t, self.sh_n], axis=-1)

    @staticmethod
    def invalid(n_lanes):
        z3 = jnp.zeros((n_lanes, 3), jnp.float32)
        z2 = jnp.zeros((n_lanes, 2), jnp.float32)
        zi = jnp.full((n_lanes,), -1, jnp.int32)
        up = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n_lanes, 1))
        sx = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (n_lanes, 1))
        sy = jnp.tile(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n_lanes, 1))
        return SurfaceInteraction(
            t=jnp.full((n_lanes,), jnp.inf, jnp.float32),
            p=z3, n=up, sh_n=up, sh_s=sx, sh_t=sy, uv=z2,
            wi=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n_lanes, 1)),
            shape_index=zi, prim_index=zi, prim_uv=z2,
        )


@struct.dataclass
class MediumInteraction:
    """Medium scatter event (reference: interaction.h MediumInteraction).
    Fork convention: sh_frame = Frame(ray.d), wi = (0,0,-1) in local space
    (reference: src/render/medium.cpp:47-54)."""

    t: jnp.ndarray          # [N]
    p: jnp.ndarray          # [N, 3]
    sh_n: jnp.ndarray       # [N, 3] = ray.d
    sh_s: jnp.ndarray
    sh_t: jnp.ndarray
    medium_index: jnp.ndarray  # [N] int32

    @property
    def is_valid(self):
        return jnp.isfinite(self.t)

    def to_world(self, v):
        return frame_to_world(self.sh_n, self.sh_s, self.sh_t, v)

    def to_local(self, v):
        return frame_to_local(self.sh_n, self.sh_s, self.sh_t, v)

    @staticmethod
    def make(t, p, d, medium_index):
        s, tt = coordinate_system(d)
        return MediumInteraction(
            t=t, p=p, sh_n=d, sh_s=s, sh_t=tt, medium_index=medium_index
        )


@struct.dataclass
class DirectionSample:
    """Emitter direction sample (reference: records.h DirectionSample3f)."""

    p: jnp.ndarray          # [N, 3] point on emitter
    n: jnp.ndarray          # [N, 3] emitter normal
    d: jnp.ndarray          # [N, 3] unit direction ref -> emitter
    dist: jnp.ndarray       # [N]
    pdf: jnp.ndarray        # [N] solid-angle density (0 for invalid)
    delta: jnp.ndarray      # [N] bool: Dirac (point/directional)
    emitter_index: jnp.ndarray  # [N] int32
    uv: jnp.ndarray         # [N, 2] emitter-surface uv (for attached re-eval)


@struct.dataclass
class BSDFSample:
    """(reference: bsdf.h BSDFSample3f)."""

    wo: jnp.ndarray         # [N, 3] local outgoing dir
    pdf: jnp.ndarray        # [N]
    eta: jnp.ndarray        # [N] relative IOR of the sampled event
    delta: jnp.ndarray      # [N] bool: specular/Dirac lobe sampled
