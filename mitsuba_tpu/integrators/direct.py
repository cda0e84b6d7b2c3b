"""Direct illumination integrator with emitter/BSDF MIS
(reference: src/integrators/direct.cpp) plus the trivial `depth` integrator
(reference: src/integrators/depth.cpp)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..render.records import Ray, spawn_ray
from .path import mis_weight, _next2


@struct.dataclass
class DirectIntegrator:
    emitter_samples: int = struct.field(pytree_node=False, default=1)
    bsdf_samples: int = struct.field(pytree_node=False, default=1)

    def sample(self, scene, rng, ray, wavelengths, active):
        n = ray.o.shape[0]
        nc = scene.n_channels
        si = scene.ray_intersect(ray, active)
        L = jnp.zeros((n, nc), jnp.float32)

        escaped = active & ~si.is_valid
        L = L + jnp.where(escaped[..., None], scene.eval_environment(ray.d, wavelengths), 0.0)
        hit = active & si.is_valid
        L = L + jnp.where(hit[..., None], scene.eval_emitter_hit(si, wavelengths), 0.0)

        for _ in range(self.emitter_samples):
            u0, ux, rng = _next2(rng)
            uy, _, rng = _next2(rng)
            ds, em_weight = scene.sample_emitter_direction(
                si.p, u0, jnp.stack([ux, uy], axis=-1), wavelengths, hit,
                test_visibility=True, ref_n=si.n,
            )
            wo_local = si.to_local(ds.d)
            bsdf_val, bsdf_pdf = scene.bsdf_eval_pdf(si, wo_local, wavelengths, hit)
            w = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf))
            L = L + jnp.where(
                hit[..., None],
                bsdf_val * em_weight * (w / self.emitter_samples)[..., None],
                0.0,
            )

        for _ in range(self.bsdf_samples):
            u_lobe, ux, rng = _next2(rng)
            uy, _, rng = _next2(rng)
            bs, bsdf_weight = scene.bsdf_sample(
                si, u_lobe, jnp.stack([ux, uy], axis=-1), wavelengths, hit
            )
            wo_world = si.to_world(bs.wo)
            ray2 = spawn_ray(si.p, si.n, wo_world)
            si2 = scene.ray_intersect(ray2, hit)
            esc2 = hit & ~si2.is_valid
            em_val2 = jnp.where(
                esc2[..., None], scene.eval_environment(ray2.d, wavelengths),
                scene.eval_emitter_hit(si2, wavelengths),
            )
            pdf_em = jnp.where(
                esc2, scene.pdf_emitter_direction_escaped(ray2.d),
                scene.pdf_emitter_direction_hit(si.p, si2),
            )
            w = jnp.where(bs.delta, 1.0, mis_weight(bs.pdf, pdf_em))
            L = L + jnp.where(
                (hit & (bs.pdf > 0))[..., None],
                bsdf_weight * em_val2 * (w / self.bsdf_samples)[..., None],
                0.0,
            )
        return L, {}


@struct.dataclass
class DepthIntegrator:
    """Distance-to-first-hit AOV (reference: src/integrators/depth.cpp)."""

    def sample(self, scene, rng, ray, wavelengths, active):
        si = scene.ray_intersect(ray, active)
        d = jnp.where(si.is_valid, si.t, 0.0)
        nc = scene.n_channels
        return jnp.broadcast_to(d[..., None], d.shape + (nc,)), {}
