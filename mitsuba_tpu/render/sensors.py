"""Sensor plugins (reference: src/sensors/*, include/mitsuba/render/sensor.h).

sample_ray(position_sample, aperture_sample, wavelength_sample) generates one
camera ray per lane.  position_sample is the film-plane sample in [0,1]^2
(u right, v down — film row 0 is the image top, matching the reference's film
coordinates).  The camera looks along +z of its to_world frame, like the
reference (src/sensors/perspective.cpp).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..core.frame import normalize
from .records import Ray


@struct.dataclass
class PerspectiveCamera:
    """Pinhole perspective camera (reference: src/sensors/perspective.cpp).
    fov_x in degrees along the film's x axis (fov_axis='x' default)."""

    to_world_m: jnp.ndarray   # [4,4]
    tan_half_fov_x: jnp.ndarray
    aspect: float = struct.field(pytree_node=False)  # width / height

    def sample_ray(self, pos_sample, ap_sample):
        x = (1.0 - 2.0 * pos_sample[..., 0]) * self.tan_half_fov_x
        y = (1.0 - 2.0 * pos_sample[..., 1]) * self.tan_half_fov_x / self.aspect
        d_cam = normalize(jnp.stack([x, y, jnp.ones_like(x)], axis=-1))
        R = self.to_world_m[:3, :3]
        o = jnp.broadcast_to(self.to_world_m[:3, 3], d_cam.shape)
        d = d_cam @ R.T
        return Ray.make(o, d)

    def project(self, p):
        """World point [N,3] -> film uv [N,2] in [0,1]^2 + validity
        (the inverse of sample_ray; used by the projective-gradient layer
        and differentiable w.r.t. p)."""
        R = self.to_world_m[:3, :3]
        pc = (p - self.to_world_m[:3, 3]) @ R    # camera frame (R orthonormal)
        z = pc[..., 2]
        valid = z > 1e-6
        zs = jnp.where(valid, z, 1.0)
        u = 0.5 * (1.0 - pc[..., 0] / (zs * self.tan_half_fov_x))
        v = 0.5 * (1.0 - pc[..., 1] * self.aspect / (zs * self.tan_half_fov_x))
        uv = jnp.stack([u, v], axis=-1)
        valid = valid & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        return uv, valid

    @property
    def position(self):
        return self.to_world_m[:3, 3]


@struct.dataclass
class ThinLensCamera:
    """Thin-lens camera with depth of field (reference: src/sensors/thinlens.cpp)."""

    to_world_m: jnp.ndarray
    tan_half_fov_x: jnp.ndarray
    aperture_radius: jnp.ndarray
    focus_distance: jnp.ndarray
    aspect: float = struct.field(pytree_node=False)

    def sample_ray(self, pos_sample, ap_sample):
        from ..core import warp

        x = (1.0 - 2.0 * pos_sample[..., 0]) * self.tan_half_fov_x
        y = (1.0 - 2.0 * pos_sample[..., 1]) * self.tan_half_fov_x / self.aspect
        d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        # point on the focal plane
        p_focus = d_cam * self.focus_distance
        lens = warp.square_to_uniform_disk_concentric(ap_sample) * self.aperture_radius
        o_cam = jnp.stack([lens[..., 0], lens[..., 1], jnp.zeros_like(x)], axis=-1)
        d_cam2 = normalize(p_focus - o_cam)
        R = self.to_world_m[:3, :3]
        o = o_cam @ R.T + self.to_world_m[:3, 3]
        d = d_cam2 @ R.T
        return Ray.make(o, d)


@struct.dataclass
class OrthographicCamera:
    """(reference: src/sensors/orthographic.cpp)."""

    to_world_m: jnp.ndarray
    aspect: float = struct.field(pytree_node=False)

    def sample_ray(self, pos_sample, ap_sample):
        x = 1.0 - 2.0 * pos_sample[..., 0]
        y = (1.0 - 2.0 * pos_sample[..., 1]) / self.aspect
        o_cam = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
        R = self.to_world_m[:3, :3]
        o = o_cam @ R.T + self.to_world_m[:3, 3]
        d = jnp.broadcast_to(R[:, 2], o.shape)
        return Ray.make(o, d)


@struct.dataclass
class RadiancemeterSensor:
    """Single-direction radiance probe; all film samples share one ray origin
    and direction.  Fork addition: optional fixed wavelength pins the spectral
    samples (reference: src/sensors/radiancemeter.cpp:86,107-115)."""

    to_world_m: jnp.ndarray
    wavelength: jnp.ndarray  # scalar; <= 0 means unset
    aspect: float = struct.field(pytree_node=False, default=1.0)

    def sample_ray(self, pos_sample, ap_sample):
        n = pos_sample.shape[0]
        o = jnp.broadcast_to(self.to_world_m[:3, 3], (n, 3))
        d = jnp.broadcast_to(self.to_world_m[:3, 2], (n, 3))
        return Ray.make(o, d)

    @property
    def fixed_wavelength(self):
        return self.wavelength


@struct.dataclass
class IrradiancemeterSensor:
    """Cosine-weighted hemispherical irradiance probe attached conceptually to
    a surface patch (reference: src/sensors/irradiancemeter.cpp).  Here:
    origin + frame from to_world; ray dir cosine-sampled from pos_sample."""

    to_world_m: jnp.ndarray
    aspect: float = struct.field(pytree_node=False, default=1.0)

    def sample_ray(self, pos_sample, ap_sample):
        from ..core import warp

        n = pos_sample.shape[0]
        d_local = warp.square_to_cosine_hemisphere(pos_sample)
        R = self.to_world_m[:3, :3]
        o = jnp.broadcast_to(self.to_world_m[:3, 3], (n, 3))
        d = d_local @ R.T
        return Ray.make(o, d)


@struct.dataclass
class DistantSensor:
    """Distant directional radiancemeter — adjoint of the directional emitter
    (fork addition, reference: src/sensors/distant.cpp:20-60).  Rays enter the
    scene antiparallel to `direction` from outside the bounding sphere,
    targeting either the bounding-disk cross-section or a fixed target point."""

    direction: jnp.ndarray       # [3] ray direction (toward the scene)
    target: jnp.ndarray          # [3] target point; used when has_target
    scene_center: jnp.ndarray    # [3]
    scene_radius: jnp.ndarray
    wavelength: jnp.ndarray      # fixed wavelength; <=0 unset
    has_target: bool = struct.field(pytree_node=False, default=False)
    aspect: float = struct.field(pytree_node=False, default=1.0)

    def sample_ray(self, pos_sample, ap_sample):
        from ..core import warp
        from ..core.frame import coordinate_system

        n = pos_sample.shape[0]
        d = normalize(jnp.broadcast_to(self.direction, (n, 3)))
        if self.has_target:
            o = jnp.broadcast_to(self.target, (n, 3)) - d * (2.0 * self.scene_radius)
        else:
            # sample on the bounding-sphere cross-section disk
            s, t = coordinate_system(d)
            disk = warp.square_to_uniform_disk_concentric(pos_sample) * self.scene_radius
            p = (
                jnp.broadcast_to(self.scene_center, (n, 3))
                + disk[..., 0:1] * s
                + disk[..., 1:2] * t
            )
            o = p - d * (2.0 * self.scene_radius)
        return Ray.make(o, d)

    @property
    def fixed_wavelength(self):
        return self.wavelength


@struct.dataclass
class BatchSensor:
    """Side-by-side composition of nested sensors on one film: film column
    band i maps to nested sensor i with x remapped to [0,1)
    (reference: src/sensors/batch.cpp; used with mi.render_test's
    column-splitting, common.py:198-302)."""

    sensors: tuple            # nested sensor instances

    def sample_ray(self, pos_sample, ap_sample):
        n = len(self.sensors)
        x = pos_sample[..., 0] * n
        idx = jnp.clip(x.astype(jnp.int32), 0, n - 1)
        x_local = x - idx.astype(jnp.float32)
        pos_local = jnp.stack([x_local, pos_sample[..., 1]], axis=-1)
        ray = None
        for i, s in enumerate(self.sensors):
            r_i = s.sample_ray(pos_local, ap_sample)
            if ray is None:
                ray = r_i
            else:
                m = (idx == i)[..., None]
                ray = ray.replace(
                    o=jnp.where(m, r_i.o, ray.o),
                    d=jnp.where(m, r_i.d, ray.d),
                )
        return ray
