"""AOV integrators (reference: src/integrators/aov.cpp, stokes.cpp,
moment.cpp)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..render.records import Ray


@struct.dataclass
class AOVIntegrator:
    """Geometric AOVs of the first hit: depth, normals, position, uv, albedo-ish
    (reference: src/integrators/aov.cpp).  `aovs` is the reference's
    'name:type' comma list; channels are packed into the image in order,
    padded/truncated to the variant's channel count when rendered through the
    standard film (full multi-channel films come with the film AOV layout)."""

    aovs: str = struct.field(pytree_node=False, default="dd.y:depth")
    # normals/positions are signed: film must not negativity-clamp them
    signed_output = True

    def _channels(self):
        out = []
        for item in self.aovs.split(","):
            parts = item.strip().split(":")
            out.append(parts[-1])
        return out

    def sample(self, scene, rng, ray, wavelengths, active):
        si = scene.ray_intersect(ray, active)
        valid = si.is_valid
        nc = scene.n_channels
        values = []
        for kind in self._channels():
            if kind == "depth":
                values.append(jnp.where(valid, si.t, 0.0)[..., None])
            elif kind in ("sh_normal", "normals", "nn"):
                values.append(jnp.where(valid[..., None], si.sh_n, 0.0))
            elif kind in ("geo_normal",):
                values.append(jnp.where(valid[..., None], si.n, 0.0))
            elif kind in ("position", "p"):
                values.append(jnp.where(valid[..., None], si.p, 0.0))
            elif kind == "uv":
                values.append(jnp.where(valid[..., None], si.uv, 0.0))
            elif kind == "albedo":
                # diffuse reflectance = eval(wo=+n) * pi (reference:
                # src/render/bsdf.cpp:47-52 eval_diffuse_reflectance default,
                # aov.cpp:139 albedo channel)
                wo_up = jnp.zeros_like(si.p).at[..., 2].set(1.0)
                alb, _ = scene.bsdf_eval_pdf(si, wo_up, wavelengths, valid)
                values.append(jnp.where(valid[..., None], alb * jnp.pi, 0.0))
            elif kind in ("shape_index", "prim_index"):
                idx = getattr(si, kind)
                values.append(idx.astype(jnp.float32)[..., None])
            else:
                raise ValueError(f"unknown AOV type {kind!r}")
        out = jnp.concatenate(values, axis=-1)
        # pack into the film's channel count
        if out.shape[-1] < nc:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, nc - out.shape[-1])])
        return out[..., :nc], {}


@struct.dataclass
class StokesIntegrator:
    """Wraps a sub-integrator and exposes the Stokes components
    (reference: src/integrators/stokes.cpp:42-151).  In polarized variants
    the nested integrator already produces [N, C, 4] Stokes radiance; this
    simply passes it through (the film lays out I/Q/U/V channels)."""

    nested: object

    def sample(self, scene, rng, ray, wavelengths, active):
        if not scene.polarized:
            raise ValueError(
                "stokes integrator requires a polarized variant "
                "(reference: stokes.cpp asserts is_polarized_v)"
            )
        return self.nested.sample(scene, rng, ray, wavelengths, active)


@struct.dataclass
class MomentIntegrator:
    """Second moments of the nested integrator's samples, for variance
    estimation (reference: src/integrators/moment.cpp).  Output channels:
    the nested mean estimate is rendered normally; this integrator returns
    the per-sample SQUARE so that film averaging yields E[X^2]."""

    nested: object

    def sample(self, scene, rng, ray, wavelengths, active):
        L, aux = self.nested.sample(scene, rng, ray, wavelengths, active)
        return L * L, aux
