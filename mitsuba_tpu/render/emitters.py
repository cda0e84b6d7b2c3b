"""Emitter plugins (reference: src/emitters/*, include/mitsuba/render/endpoint.h).

Semantics mirror the reference Endpoint API:
  * sample_direction(ref_p, u) -> (DirectionSample, weight) with
    weight = radiance / pdf (endpoint.h sample_direction docs)
  * pdf_direction -> solid-angle density (0 for Dirac emitters)
  * eval(si) -> radiance for rays hitting the emitter's shape / environment

Area emitters sample their shape's triangles area-uniformly via a per-emitter
CDF built at scene-load time (reference: src/emitters/area.cpp + Shape::
sample_position).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..core import warp
from ..core.frame import dot, normalize
from ..core.math import INV_FOUR_PI, lookup_rows, safe_sqrt
from .records import DirectionSample


def _ds(p, n, d, dist, pdf, delta, idx_val, nlanes, uv=None):
    if uv is None:
        uv = jnp.zeros((nlanes, 2), jnp.float32)
    return DirectionSample(
        p=p, n=n, d=d, dist=dist, pdf=pdf,
        delta=jnp.full((nlanes,), delta, bool),
        emitter_index=jnp.full((nlanes,), idx_val, jnp.int32),
        uv=uv,
    )


@struct.dataclass
class AreaEmitter:
    """Diffuse area light attached to a shape (reference: src/emitters/area.cpp)."""

    radiance: object            # texture
    shape_index: int = struct.field(pytree_node=False)
    # triangle table of the attached shape (indices into the scene Geometry)
    tri_index: jnp.ndarray      # [K] int32
    tri_cdf: jnp.ndarray        # [K] area cdf (unnormalized, ends at total area)
    total_area: jnp.ndarray     # scalar

    is_environment = False
    is_delta = False

    def eval(self, si, wavelengths, n_channels):
        """Radiance toward si.wi side; front face only (cos > 0)."""
        front = si.wi[..., 2] > 0
        val = self.radiance.eval(si.uv, wavelengths, n_channels)
        return jnp.where(front[..., None], val, 0.0)

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        n_lanes = ref_p.shape[0]
        # pick triangle by area
        scaled = u2[..., 0] * self.total_area
        k = jnp.clip(jnp.searchsorted(self.tri_cdf, scaled, side="right", method="compare_all"), 0, self.tri_cdf.shape[0] - 1)
        # pack the emitter's triangle data + cdf segment bounds into one
        # [K, 14] table and do a single MXU one-hot lookup: per-lane gathers
        # from small tables are ~11x slower on TPU (see core.math.lookup_rows)
        cdf_lo = jnp.concatenate([jnp.zeros((1,), jnp.float32), self.tri_cdf[:-1]])
        tbl = jnp.concatenate(
            [
                geom.tri_v0[self.tri_index], geom.tri_e1[self.tri_index],
                geom.tri_e2[self.tri_index], geom.tri_ng[self.tri_index],
                cdf_lo[:, None], self.tri_cdf[:, None],
            ],
            axis=-1,
        )  # [K, 14]; loop-invariant -> hoisted out of the bounce scan by XLA
        row = lookup_rows(tbl, k)
        v0, e1, e2, ng = row[..., 0:3], row[..., 3:6], row[..., 6:9], row[..., 9:12]
        # uniform barycentric from remaining dims (reuse u0 within-tri + u1)
        lo = row[..., 12]
        seg = jnp.maximum(row[..., 13] - lo, 1e-20)
        u0r = jnp.clip((scaled - lo) / seg, 0.0, 1.0)
        bary = warp.square_to_uniform_triangle(jnp.stack([u0r, u2[..., 1]], axis=-1))
        p = v0 + bary[..., 0:1] * e1 + bary[..., 1:2] * e2

        to_p = p - ref_p
        dist2 = jnp.sum(to_p * to_p, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        d = to_p / dist[..., None]
        cos_e = -dot(d, ng)
        # solid-angle pdf = dist^2 / (cos_e * A)
        valid = cos_e > 1e-6
        # condition-based safe denominators: a bare maximum() clamp still
        # yields inf in the masked branch whose VJP poisons geometry
        # gradients with 0*inf = NaN
        pdf = jnp.where(
            valid, dist2 / jnp.where(valid, cos_e * self.total_area, 1.0), 0.0
        )
        uv = bary  # use barycentric as uv surrogate for texture lookup
        val = self.radiance.eval(uv, wavelengths, n_channels)
        pos = pdf > 0
        weight = jnp.where(
            pos[..., None], val / jnp.where(pos, pdf, 1.0)[..., None], 0.0
        )
        ds = _ds(p, ng, d, dist, pdf, False, emitter_index, n_lanes, uv=uv)
        return ds, weight

    def pdf_direction(self, ref_p, si):
        """Solid-angle pdf of having sampled the point si.p on this emitter
        from ref_p (reference: area.cpp pdf_direction via Shape::pdf_direction)."""
        to_p = si.p - ref_p
        dist2 = jnp.sum(to_p * to_p, axis=-1)
        ok = dist2 > 1e-18
        d = to_p * jax.lax.rsqrt(jnp.where(ok, dist2, 1.0))[..., None]
        cos_e = -dot(d, si.n)
        valid = ok & (cos_e > 1e-6)
        return jnp.where(
            valid, dist2 / jnp.where(valid, cos_e * self.total_area, 1.0), 0.0
        )


@struct.dataclass
class AreaEmitterArray:
    """Many mesh area lights fused into ONE SoA emitter instance — the
    area-light twin of PointEmitterArray (VERDICT r4 item 7).  The reference
    dispatches per-plugin vcalls whose wavefront analog costs O(#lights)
    masked evaluations per lane (scene.cpp:299-353); here triangle selection
    is one power-weighted inverse-CDF over the UNION of all fused lights'
    triangles, the chosen triangle's geometry+metadata row is fetched with
    one MXU one-hot lookup, and the radiance table [K, Cv] stays a single
    differentiable leaf — per-lane NEE cost is O(1) in the light count.

    Selection density: triangle t of light k is picked with probability
    area_t * lum_k / Z (Z = sum over all fused triangles), i.e. the area
    pdf of a sampled point is lum_k / Z — uniform within each light, power-
    weighted between lights (the fused analog of the reference's
    m_emitter_distr, scene.cpp:238-250).  Selection weights are detached."""

    values: jnp.ndarray            # [K, Cv] constant radiance rows (diff leaf)
    tri_index: jnp.ndarray         # [T] int32 triangle ids (geometry order)
    tri_light: jnp.ndarray         # [T] int32 internal light id per triangle
    tri_cdf: jnp.ndarray           # [T] selection cdf, normalized to 1 (detached)
    area_pdf: jnp.ndarray          # [K] per-unit-area pdf lum_k / Z (detached)
    shape_to_light: jnp.ndarray    # [n_shapes] int32 internal id, -1 = none
    total_power: jnp.ndarray = 1.0  # scalar pi * sum_k area_k * lum_k (detached)

    is_environment = False
    is_delta = False

    def _value_rows(self, k, wavelengths, n_channels):
        from .textures import _to_channels

        val = lookup_rows(self.values, k)
        return _to_channels(val, n_channels, wavelengths, True)

    def _light_of(self, si):
        shape_idx = jnp.maximum(si.shape_index, 0)
        tbl = self.shape_to_light
        k = tbl[shape_idx] if tbl.shape[0] > 64 else lookup_rows(
            tbl.astype(jnp.float32)[:, None], shape_idx
        )[:, 0].astype(jnp.int32)
        return jnp.where(si.shape_index >= 0, k, -1)

    def eval(self, si, wavelengths, n_channels):
        k = self._light_of(si)
        front = (si.wi[..., 2] > 0) & (k >= 0)
        val = self._value_rows(jnp.maximum(k, 0), wavelengths, n_channels)
        return jnp.where(front[..., None], val, 0.0)

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        n_lanes = ref_p.shape[0]
        T = self.tri_index.shape[0]
        u = u2[..., 0]
        t = jnp.clip(
            jnp.searchsorted(self.tri_cdf, u, side="right",
                             method="compare_all" if T <= 4096 else "scan"),
            0, T - 1,
        ).astype(jnp.int32)
        # packed per-triangle row: geometry (read from geom at use so vertex
        # gradients flow), cdf segment, light id, area pdf — ONE lookup
        cdf_lo = jnp.concatenate([jnp.zeros((1,), jnp.float32), self.tri_cdf[:-1]])
        tbl = jnp.concatenate(
            [
                geom.tri_v0[self.tri_index], geom.tri_e1[self.tri_index],
                geom.tri_e2[self.tri_index], geom.tri_ng[self.tri_index],
                cdf_lo[:, None], self.tri_cdf[:, None],
                self.tri_light.astype(jnp.float32)[:, None],
                self.area_pdf[self.tri_light][:, None],
            ],
            axis=-1,
        )  # [T, 16]
        row = lookup_rows(tbl, t)
        v0, e1, e2, ng = row[..., 0:3], row[..., 3:6], row[..., 6:9], row[..., 9:12]
        lo = row[..., 12]
        seg = jnp.maximum(row[..., 13] - lo, 1e-20)
        k = row[..., 14].astype(jnp.int32)
        p_area = row[..., 15]
        u0r = jnp.clip((u - lo) / seg, 0.0, 1.0)
        bary = warp.square_to_uniform_triangle(jnp.stack([u0r, u2[..., 1]], axis=-1))
        p = v0 + bary[..., 0:1] * e1 + bary[..., 1:2] * e2

        to_p = p - ref_p
        dist2 = jnp.sum(to_p * to_p, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        d = to_p / dist[..., None]
        cos_e = -dot(d, ng)
        valid = cos_e > 1e-6
        pdf = jnp.where(
            valid, dist2 * p_area / jnp.where(valid, cos_e, 1.0), 0.0
        )
        val = self._value_rows(k, wavelengths, n_channels)
        pos = pdf > 0
        weight = jnp.where(
            pos[..., None], val / jnp.where(pos, pdf, 1.0)[..., None], 0.0
        )
        # uv carries the internal light id for eval_sample_value (constant
        # radiance rows have no texture coordinate to preserve)
        uv = jnp.stack([k.astype(jnp.float32), jnp.zeros((n_lanes,))], axis=-1)
        ds = _ds(p, ng, d, dist, pdf, False, emitter_index, n_lanes, uv=uv)
        return ds, weight

    def eval_sample_value(self, ds, wavelengths, n_channels):
        """Differentiable radiance of the light recorded in ds.uv[...,0]
        (PRB attached recompute, scene.eval_emitter_sample)."""
        return self._value_rows(ds.uv[..., 0].astype(jnp.int32), wavelengths,
                                n_channels)

    def pdf_direction(self, ref_p, si):
        """Solid-angle NEE pdf of the fused group for a hit on one of its
        lights (internal selection included; the scene-level group pmf is
        applied by the caller, scene.pdf_emitter_direction_hit)."""
        k = self._light_of(si)
        p_area = lookup_rows(self.area_pdf[:, None], jnp.maximum(k, 0))[:, 0]
        to_p = si.p - ref_p
        dist2 = jnp.sum(to_p * to_p, axis=-1)
        ok = (dist2 > 1e-18) & (k >= 0)
        d = to_p * jax.lax.rsqrt(jnp.where(ok, dist2, 1.0))[..., None]
        cos_e = -dot(d, si.n)
        valid = ok & (cos_e > 1e-6)
        return jnp.where(
            valid, dist2 * p_area / jnp.where(valid, cos_e, 1.0), 0.0
        )


@struct.dataclass
class SphereAreaEmitter:
    """Diffuse area light on an analytic sphere with EXACT solid-angle cone
    sampling (reference: src/shapes/sphere.cpp sample_direction — uniform
    cone of half-angle asin(r/L) — consumed by src/emitters/area.cpp through
    the Shape interface).  Every sampled direction hits the sphere, and the
    pdf is constant over the subtended cone, so NEE variance is far below
    area sampling for small/far spheres."""

    radiance: object            # texture
    # sphere read from Geometry at use so params.update() edits and the
    # projective interior vjp (which replace geometry.sph_*) stay live —
    # a load-time copy went stale (advisor finding, round 4)
    sphere_index: int = struct.field(pytree_node=False)
    shape_index: int = struct.field(pytree_node=False)

    is_environment = False
    is_delta = False

    # scene.pdf_emitter_direction_* passes geometry to this emitter
    needs_geometry = True

    def eval(self, si, wavelengths, n_channels):
        front = si.wi[..., 2] > 0
        val = self.radiance.eval(si.uv, wavelengths, n_channels)
        return jnp.where(front[..., None], val, 0.0)

    def _cone(self, ref_p, geom):
        center = geom.sph_center[self.sphere_index]
        radius = geom.sph_radius[self.sphere_index]
        dc = center - ref_p
        L2 = jnp.sum(dc * dc, axis=-1)
        L = safe_sqrt(jnp.maximum(L2, 1e-20))
        dh = dc / L[..., None]
        outside = L > radius * 1.0001
        sin2_max = jnp.clip(
            (radius / jnp.maximum(L, 1e-12)) ** 2, 0.0, 1.0 - 1e-7
        )
        cos_max = safe_sqrt(1.0 - sin2_max)
        return center, radius, dc, L2, L, dh, outside, cos_max

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        from ..core.frame import coordinate_system

        n_lanes = ref_p.shape[0]
        center, radius, dc, L2, L, dh, outside, cos_max = self._cone(ref_p, geom)
        cos_t = 1.0 - u2[..., 0] * (1.0 - cos_max)
        sin_t = safe_sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = (2.0 * jnp.pi) * u2[..., 1]
        e1, e2 = coordinate_system(dh)
        d = (
            cos_t[..., None] * dh
            + sin_t[..., None] * (jnp.cos(phi)[..., None] * e1
                                  + jnp.sin(phi)[..., None] * e2)
        )
        # near intersection distance along d (guaranteed >= 0 inside the cone
        # up to round-off; clamp the discriminant)
        b = jnp.sum(d * dc, axis=-1)
        disc = b * b - (L2 - radius ** 2)
        dist = b - safe_sqrt(jnp.maximum(disc, 0.0))
        p = ref_p + dist[..., None] * d
        n = normalize(p - center)
        solid = (2.0 * jnp.pi) * jnp.maximum(1.0 - cos_max, 1e-12)
        pdf = jnp.where(outside, 1.0 / solid, 0.0)
        uv = _sphere_uv(n)
        val = self.radiance.eval(uv, wavelengths, n_channels)
        weight = jnp.where(
            outside[..., None], val * solid[..., None], 0.0
        )
        ds = _ds(p, n, d, dist, pdf, False, emitter_index, n_lanes, uv=uv)
        return ds, weight

    def pdf_direction(self, ref_p, si, geom):
        """Cone pdf for a direction from ref_p known to hit this sphere
        (si.p on the surface is inside the subtended cone by construction)."""
        _, _, _, _, _, _, outside, cos_max = self._cone(ref_p, geom)
        solid = (2.0 * jnp.pi) * jnp.maximum(1.0 - cos_max, 1e-12)
        return jnp.where(outside, 1.0 / solid, 0.0)


def _sphere_uv(n):
    theta = jnp.arccos(jnp.clip(n[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(n[..., 1], n[..., 0])
    return jnp.stack([phi / (2.0 * jnp.pi) + 0.5, theta / jnp.pi], axis=-1)


@struct.dataclass
class PointEmitter:
    """Isotropic point light (reference: src/emitters/point.cpp)."""

    intensity: object   # texture (radiant intensity)
    position: jnp.ndarray

    is_environment = False
    is_delta = True

    def eval(self, si, wavelengths, n_channels):
        return jnp.zeros(si.p.shape[:-1] + (n_channels,), jnp.float32)

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        n_lanes = ref_p.shape[0]
        to_p = self.position - ref_p
        dist2 = jnp.sum(to_p * to_p, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        d = to_p / dist[..., None]
        uv = jnp.zeros((n_lanes, 2), jnp.float32)
        val = self.intensity.eval(uv, wavelengths, n_channels)
        weight = val / dist2[..., None]
        ds = _ds(
            jnp.broadcast_to(self.position, ref_p.shape), -d, d, dist,
            jnp.ones((n_lanes,), jnp.float32), True, emitter_index, n_lanes
        )
        return ds, weight

    def pdf_direction(self, ref_p, si):
        return jnp.zeros(ref_p.shape[:-1], jnp.float32)


@struct.dataclass
class PointEmitterArray:
    """Many point lights fused into ONE SoA emitter instance (TPU-native
    many-light path; reference behavior: each point light is a separate
    plugin, scene.cpp uniform selection — that design costs O(#lights) masked
    work per lane in the wavefront vcall loop).  Here selection is an
    internal power-weighted inverse-CDF and the chosen light's row is fetched
    with one MXU one-hot lookup, so per-lane cost is O(1) in the light count
    and the intensity table [K, C] stays a single differentiable leaf."""

    values: jnp.ndarray      # [K, Ct] rgb (Ct=3) or mono (Ct=1) intensities
    positions: jnp.ndarray   # [K, 3]

    is_environment = False
    is_delta = True

    def eval(self, si, wavelengths, n_channels):
        return jnp.zeros(si.p.shape[:-1] + (n_channels,), jnp.float32)

    def _sel_cdf(self):
        from ..core import spectrum as spec

        v = self.values
        lum = spec.luminance(v) if v.shape[-1] == 3 else v[..., 0]
        w = jnp.maximum(jax.lax.stop_gradient(lum), 1e-12)
        cdf = jnp.cumsum(w)
        return cdf / cdf[-1]

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        from .textures import _to_channels

        n_lanes = ref_p.shape[0]
        K = self.positions.shape[0]
        cdf = self._sel_cdf()
        k = jnp.clip(
            jnp.searchsorted(cdf, u2[..., 0], side="right", method="compare_all"),
            0, K - 1,
        ).astype(jnp.int32)
        cdf_lo = jnp.concatenate([jnp.zeros((1,), jnp.float32), cdf[:-1]])
        tbl = jnp.concatenate(
            [self.positions, self.values, cdf_lo[:, None], cdf[:, None]], axis=-1
        )  # [K, 3+Ct+2]
        row = lookup_rows(tbl, k)
        pos = row[..., 0:3]
        val = row[..., 3:3 + self.values.shape[-1]]
        pk = jnp.maximum(row[..., -1] - row[..., -2], 1e-12)

        to_p = pos - ref_p
        dist2 = jnp.sum(to_p * to_p, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        d = to_p / dist[..., None]
        val_c = _to_channels(val, n_channels, wavelengths, True)
        weight = val_c / (dist2 * pk)[..., None]
        uv = jnp.stack([k.astype(jnp.float32), jnp.zeros((n_lanes,))], axis=-1)
        ds = _ds(pos, -d, d, dist, jnp.ones((n_lanes,), jnp.float32), True,
                 emitter_index, n_lanes, uv=uv)
        return ds, weight

    def eval_sample_value(self, ds, wavelengths, n_channels):
        """Differentiable intensity of the light recorded in ds.uv[...,0]
        (used by the PRB attached recompute, scene.eval_emitter_sample)."""
        from .textures import _to_channels

        k = ds.uv[..., 0].astype(jnp.int32)
        val = lookup_rows(self.values, k)
        return _to_channels(val, n_channels, wavelengths, True)

    def pdf_direction(self, ref_p, si):
        return jnp.zeros(ref_p.shape[:-1], jnp.float32)


@struct.dataclass
class ConstantEmitter:
    """Uniform environment radiance (reference: src/emitters/constant.cpp)."""

    radiance: object
    scene_radius: jnp.ndarray  # bounding-sphere radius for position records

    is_environment = True
    is_delta = False

    def eval(self, si, wavelengths, n_channels):
        n = si.p.shape[0]
        uv = jnp.zeros((n, 2), jnp.float32)
        return self.radiance.eval(uv, wavelengths, n_channels)

    def eval_escaped(self, d, wavelengths, n_channels):
        n = d.shape[0]
        uv = jnp.zeros((n, 2), jnp.float32)
        return self.radiance.eval(uv, wavelengths, n_channels)

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        n_lanes = ref_p.shape[0]
        d = warp.square_to_uniform_sphere(u2)
        pdf = jnp.full((n_lanes,), INV_FOUR_PI, jnp.float32)
        dist = jnp.full((n_lanes,), 2.0, jnp.float32) * jnp.maximum(self.scene_radius, 1.0)
        uv = jnp.zeros((n_lanes, 2), jnp.float32)
        val = self.radiance.eval(uv, wavelengths, n_channels)
        weight = val / pdf[..., None]
        ds = _ds(ref_p + d * dist[..., None], -d, d, dist, pdf, False, emitter_index, n_lanes)
        return ds, weight

    def pdf_direction(self, ref_p, si):
        return jnp.full(ref_p.shape[:-1], INV_FOUR_PI, jnp.float32)

    def pdf_direction_escaped(self, d):
        return jnp.full(d.shape[:-1], INV_FOUR_PI, jnp.float32)


@struct.dataclass
class DirectionalEmitter:
    """Distant directional emitter (reference: src/emitters/directional.cpp,
    239 LoC — the sun of the AOS configurations)."""

    irradiance: object
    direction: jnp.ndarray    # [3] direction of light propagation (world)
    scene_radius: jnp.ndarray

    is_environment = False
    is_delta = True

    def eval(self, si, wavelengths, n_channels):
        return jnp.zeros(si.p.shape[:-1] + (n_channels,), jnp.float32)

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        n_lanes = ref_p.shape[0]
        d = -normalize(jnp.broadcast_to(self.direction, ref_p.shape))
        dist = jnp.full((n_lanes,), 2.0, jnp.float32) * jnp.maximum(self.scene_radius, 1.0)
        uv = jnp.zeros((n_lanes, 2), jnp.float32)
        val = self.irradiance.eval(uv, wavelengths, n_channels)
        ds = _ds(
            ref_p + d * dist[..., None], -d, d, dist,
            jnp.ones((n_lanes,), jnp.float32), True, emitter_index, n_lanes
        )
        return ds, val

    def pdf_direction(self, ref_p, si):
        return jnp.zeros(ref_p.shape[:-1], jnp.float32)


@struct.dataclass
class SpotEmitter:
    """Spot light with linear falloff between cutoff and beam-width angles
    (reference: src/emitters/spot.cpp)."""

    intensity: object
    position: jnp.ndarray
    direction: jnp.ndarray     # propagation direction
    cos_cutoff: jnp.ndarray
    cos_beam_width: jnp.ndarray

    is_environment = False
    is_delta = True

    def eval(self, si, wavelengths, n_channels):
        return jnp.zeros(si.p.shape[:-1] + (n_channels,), jnp.float32)

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        n_lanes = ref_p.shape[0]
        to_p = self.position - ref_p
        dist2 = jnp.sum(to_p * to_p, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        d = to_p / dist[..., None]
        cos_a = dot(-d, normalize(jnp.broadcast_to(self.direction, ref_p.shape)))
        falloff = jnp.clip(
            (cos_a - self.cos_cutoff)
            / jnp.maximum(self.cos_beam_width - self.cos_cutoff, 1e-6),
            0.0,
            1.0,
        )
        uv = jnp.zeros((n_lanes, 2), jnp.float32)
        val = self.intensity.eval(uv, wavelengths, n_channels)
        weight = val * (falloff / jnp.maximum(dist2, 1e-20))[..., None]
        ds = _ds(
            jnp.broadcast_to(self.position, ref_p.shape), -d, d, dist,
            jnp.ones((n_lanes,), jnp.float32), True, emitter_index, n_lanes
        )
        return ds, weight

    def pdf_direction(self, ref_p, si):
        return jnp.zeros(ref_p.shape[:-1], jnp.float32)


@struct.dataclass
class EnvmapEmitter:
    """Lat-long environment map with luminance importance sampling
    (reference: src/emitters/envmap.cpp; Hierarchical2D warp replaced by a
    row/column marginal-CDF warp, equivalent density)."""

    data: jnp.ndarray          # [H, W, 3]
    row_cdf: jnp.ndarray       # [H] marginal cdf over rows (sin-weighted)
    cond_cdf: jnp.ndarray      # [H, W] conditional cdf per row
    scale: jnp.ndarray
    scene_radius: jnp.ndarray
    to_world_rot: jnp.ndarray  # [3,3]

    is_environment = True
    is_delta = False

    def _eval_dir(self, d_world, wavelengths, n_channels):
        d = d_world @ self.to_world_rot  # world -> emitter local (rot^T via right-mul)
        theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
        phi = jnp.arctan2(-d[..., 0], d[..., 2])
        u = phi / (2 * jnp.pi) + 0.5
        v = theta / jnp.pi
        h, w = self.data.shape[0], self.data.shape[1]
        x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        rgb = self.data[y, x] * self.scale
        from .textures import _to_channels

        return _to_channels(rgb, n_channels, wavelengths)

    def eval(self, si, wavelengths, n_channels):
        return self._eval_dir(-si.wi, wavelengths, n_channels)  # si.wi here world -d

    def eval_escaped(self, d, wavelengths, n_channels):
        return self._eval_dir(d, wavelengths, n_channels)

    def _pdf_dir(self, d_world):
        """Exact density of the texel-CDF warp below: the texel's table mass
        lum(y,x)*sin(theta_row_center) spreads uniformly over the texel in
        (u, v), so in solid angle
            p(d) = h*w * lum * sin(theta_c) / (2 pi^2 * total * sin(theta)).
        (The sin factors do NOT cancel — dropping them misdistributes rows by
        up to the per-row sin ratio; caught by the chi2 EmitterAdapter.)"""
        d = d_world @ self.to_world_rot
        theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
        phi = jnp.arctan2(-d[..., 0], d[..., 2])
        u = phi / (2 * jnp.pi) + 0.5
        v = theta / jnp.pi
        h, w = self.data.shape[0], self.data.shape[1]
        x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        lum = jnp.sum(self.data[y, x], axis=-1)
        theta_c = (y.astype(jnp.float32) + 0.5) / h * jnp.pi
        total = jnp.maximum(self.row_cdf[-1], 1e-20)
        return (h * w) * lum * jnp.sin(theta_c) / (
            2.0 * jnp.pi**2 * total * jnp.maximum(jnp.sin(theta), 1e-6)
        )

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        """Texel-CDF warp with CDF-residual jitter: the inversion residuals
        give continuous (u, v) positions uniform within the selected texel
        (reference: envmap.cpp:103 Hierarchical2D sample; texel-center-only
        sampling is a DISCRETE distribution that biases NEE against any
        direction-varying integrand)."""
        n_lanes = ref_p.shape[0]
        h, w = self.data.shape[0], self.data.shape[1]
        uy = u2[..., 0] * self.row_cdf[-1]
        y = jnp.clip(
            jnp.searchsorted(
                self.row_cdf, uy, side="right",
                method="compare_all" if h <= 512 else "scan",
            ),
            0, h - 1,
        )
        lo_y = jnp.where(y > 0, self.row_cdf[jnp.maximum(y - 1, 0)], 0.0)
        wgt_y = self.row_cdf[y] - lo_y
        fy = jnp.clip((uy - lo_y) / jnp.maximum(wgt_y, 1e-20), 0.0, 1.0 - 1e-6)
        row = self.cond_cdf[y]
        tot = row[:, -1]
        ux = u2[..., 1] * tot
        x = jnp.clip(_rowwise_searchsorted(row, ux), 0, w - 1)
        lo_x = jnp.where(x > 0, jnp.take_along_axis(
            row, jnp.maximum(x - 1, 0)[:, None], axis=1)[:, 0], 0.0)
        wgt_x = jnp.take_along_axis(row, x[:, None], axis=1)[:, 0] - lo_x
        fx = jnp.clip((ux - lo_x) / jnp.maximum(wgt_x, 1e-20), 0.0, 1.0 - 1e-6)

        theta = (y.astype(jnp.float32) + fy) / h * jnp.pi
        phi = ((x.astype(jnp.float32) + fx) / w - 0.5) * 2 * jnp.pi
        sin_t = jnp.sin(theta)
        d_local = jnp.stack(
            [-sin_t * jnp.sin(phi), jnp.cos(theta), sin_t * jnp.cos(phi)], axis=-1
        )
        d = d_local @ self.to_world_rot.T
        pdf = self._pdf_dir(d)
        dist = jnp.full((n_lanes,), 2.0, jnp.float32) * jnp.maximum(self.scene_radius, 1.0)
        val = self._eval_dir(d, wavelengths, n_channels)
        weight = jnp.where((pdf > 0)[..., None], val / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
        ds = _ds(ref_p + d * dist[..., None], -d, d, dist, pdf, False, emitter_index, n_lanes)
        return ds, weight

    def pdf_direction(self, ref_p, si):
        to_p = si.p - ref_p
        d = to_p / jnp.sqrt(jnp.maximum(jnp.sum(to_p * to_p, axis=-1, keepdims=True), 1e-20))
        return self._pdf_dir(d)

    def pdf_direction_escaped(self, d):
        return self._pdf_dir(d)


def _rowwise_searchsorted(rows, vals):
    """Vectorized per-row searchsorted: rows [N, W] cdfs, vals [N]."""
    return jnp.sum(rows < vals[:, None], axis=-1).astype(jnp.int32)


def build_envmap_tables(data, scale):
    """Host-side luminance-CDF build (reference: envmap.cpp:103 Hierarchical2D)."""
    data = np.asarray(data, np.float32)
    h, w = data.shape[0], data.shape[1]
    lum = data.sum(-1)
    sin_theta = np.sin((np.arange(h) + 0.5) / h * np.pi)
    wgt = lum * sin_theta[:, None]
    cond_cdf = np.cumsum(wgt, axis=1)
    row_cdf = np.cumsum(cond_cdf[:, -1])
    return jnp.asarray(row_cdf), jnp.asarray(cond_cdf)


@struct.dataclass
class ProjectorEmitter:
    """Textured perspective projector (reference: src/emitters/projector.cpp):
    a point source projecting an image within a perspective frustum; the
    texture is looked up at the projected film coordinate of the outgoing
    direction.  Delta position => NEE-only, like point/spot."""

    irradiance: object            # texture (the projected image)
    scale: jnp.ndarray
    position: jnp.ndarray
    to_world_r: jnp.ndarray       # [3,3] rotation: world <- projector camera
    tan_half_fov_x: jnp.ndarray
    aspect: float = struct.field(pytree_node=False, default=1.0)

    is_environment = False
    is_delta = True

    def eval(self, si, wavelengths, n_channels):
        return jnp.zeros(si.p.shape[:-1] + (n_channels,), jnp.float32)

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        n_lanes = ref_p.shape[0]
        to_p = self.position - ref_p
        dist2 = jnp.sum(to_p * to_p, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        d = to_p / dist[..., None]          # ref -> projector
        # direction of projection (projector -> ref) in projector camera frame
        v = (-d) @ self.to_world_r          # R^T (-d)
        z = v[..., 2]
        in_front = z > 1e-6
        tx = self.tan_half_fov_x
        ty = tx / self.aspect
        u = 0.5 * (1.0 - v[..., 0] / jnp.maximum(z, 1e-6) / tx)
        w = 0.5 * (1.0 - v[..., 1] / jnp.maximum(z, 1e-6) / ty)
        on_film = in_front & (u >= 0) & (u < 1) & (w >= 0) & (w < 1)
        uv = jnp.stack([u, 1.0 - w], axis=-1)
        val = self.irradiance.eval(uv, wavelengths, n_channels) * self.scale
        weight = jnp.where(
            on_film[..., None], val / jnp.maximum(dist2, 1e-20)[..., None], 0.0
        )
        ds = _ds(
            jnp.broadcast_to(self.position, ref_p.shape), -d, d, dist,
            jnp.ones((n_lanes,), jnp.float32), True, emitter_index, n_lanes
        )
        return ds, weight

    def pdf_direction(self, ref_p, si):
        return jnp.zeros(ref_p.shape[:-1], jnp.float32)


@struct.dataclass
class DirectionalAreaEmitter:
    """Area shape emitting only along its surface normal (collimated panel,
    reference: src/emitters/directionalarea.cpp).  Doubly-delta (position x
    direction): cannot be NEE-sampled from a point nor hit by a path — its
    contribution comes from particle tracing (ptracer emits along +n)."""

    radiance: object
    shape_index: int = struct.field(pytree_node=False)
    tri_index: jnp.ndarray
    tri_cdf: jnp.ndarray
    total_area: jnp.ndarray

    is_environment = False
    is_delta = True
    is_directional_area = True

    def eval(self, si, wavelengths, n_channels):
        return jnp.zeros(si.p.shape[:-1] + (n_channels,), jnp.float32)

    def sample_direction(self, ref_p, u2, geom, wavelengths, n_channels, emitter_index):
        n_lanes = ref_p.shape[0]
        zero = jnp.zeros((n_lanes, n_channels), jnp.float32)
        ds = _ds(
            ref_p, jnp.zeros_like(ref_p), jnp.zeros_like(ref_p),
            jnp.zeros((n_lanes,)), jnp.zeros((n_lanes,)), True,
            emitter_index, n_lanes,
        )
        return ds, zero

    def pdf_direction(self, ref_p, si):
        return jnp.zeros(ref_p.shape[:-1], jnp.float32)
