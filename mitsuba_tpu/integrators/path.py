"""Surface path tracer with NEE + BSDF-sampling MIS
(reference: src/integrators/path.cpp, 324 LoC).

Wavefront design: one lax.while_loop over bounces with SoA path state and
per-lane active masks (the TPU analog of the reference's dr::Loop,
path.cpp's `dr::Loop<Bool> l(...)`).  Random numbers are drawn unconditionally
in a fixed per-iteration order so the counter-based streams replay identically
in PRB backward passes (SURVEY.md hard-part #3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..render.records import Ray, spawn_ray


def mis_weight(pdf_a, pdf_b):
    """Power heuristic (beta=2), matching the reference
    (path.cpp mis_weight / common.py:1817)."""
    a2 = pdf_a * pdf_a
    w = a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-30)
    return jnp.where(pdf_a > 0, w, 0.0)


@struct.dataclass
class PathIntegrator:
    max_depth: int = struct.field(pytree_node=False, default=8)
    rr_depth: int = struct.field(pytree_node=False, default=5)
    hide_emitters: bool = struct.field(pytree_node=False, default=False)
    # deferred NEE: bounce-k shadow rays are traced in bounce-k+1's fused
    # 2N-ray intersect launch (halves kernel launches + dependency depth).
    # Auto-disabled on BVH geometry, whose any-hit shadow kernel is cheaper
    # than a closest-hit batch.
    defer_nee: bool = struct.field(pytree_node=False, default=True)

    def sample(self, scene, rng, ray, wavelengths, active):
        n = ray.o.shape[0]
        nc = scene.n_channels
        max_depth = self.max_depth if self.max_depth > 0 else 1024
        defer = self.defer_nee and not scene.geometry.has_bvh

        L0 = jnp.zeros((n, nc), jnp.float32)
        beta0 = jnp.ones((n, nc), jnp.float32)
        state = dict(
            depth=jnp.asarray(0, jnp.int32),
            n_rays=jnp.asarray(0.0, jnp.float32),
            L=L0,
            beta=beta0,
            eta=jnp.ones((n,), jnp.float32),
            ray_o=ray.o,
            ray_d=ray.d,
            rng=rng,
            active=active,
            prev_pdf=jnp.ones((n,), jnp.float32),
            prev_delta=jnp.ones((n,), bool),
            prev_p=ray.o,
        )
        if defer:
            state.update(
                pend_o=ray.o,
                pend_d=ray.d,
                pend_maxt=jnp.zeros((n,), jnp.float32),
                pend_active=jnp.zeros((n,), bool),
                pend_contrib=jnp.zeros((n, nc), jnp.float32),
            )

        def body(s):
            rng = s["rng"]
            cur_ray = Ray.make(s["ray_o"], s["ray_d"])
            if defer:
                si, occluded = scene.ray_intersect_and_test(
                    cur_ray,
                    Ray(o=s["pend_o"], d=s["pend_d"], maxt=s["pend_maxt"]),
                    s["active"], s["pend_active"],
                )
                L_pend = jnp.where(
                    (s["pend_active"] & ~occluded)[..., None], s["pend_contrib"], 0.0
                )
                s = dict(s, L=s["L"] + L_pend)
            else:
                si = scene.ray_intersect(cur_ray, s["active"])
            first = s["depth"] == 0

            # ---- emitter hits / escaped rays, MIS vs previous BSDF pdf ----
            escaped = s["active"] & ~si.is_valid
            env_val = scene.eval_environment(s["ray_d"], wavelengths)
            env_pdf = jnp.where(
                s["prev_delta"], 0.0, scene.pdf_emitter_direction_escaped(s["ray_d"])
            )
            w_env = mis_weight(s["prev_pdf"], env_pdf)
            hide = self.hide_emitters & first
            L = s["L"] + jnp.where(
                (escaped & ~hide)[..., None], s["beta"] * w_env[..., None] * env_val, 0.0
            )

            hit_em = s["active"] & si.is_valid
            em_val = scene.eval_emitter_hit(si, wavelengths)
            em_pdf = jnp.where(
                s["prev_delta"], 0.0,
                scene.pdf_emitter_direction_hit(s["prev_p"], si),
            )
            w_em = mis_weight(s["prev_pdf"], em_pdf)
            L = L + jnp.where(
                (hit_em & ~hide)[..., None], s["beta"] * w_em[..., None] * em_val, 0.0
            )

            active_next = s["active"] & si.is_valid & (s["depth"] + 1 < max_depth)

            # ---- NEE (reference: path.cpp sample_emitter_direction block) ----
            u0, u2a_x, rng = _next2(rng)
            u2a_y, u_lobe, rng = _next2(rng)
            u2b_x, u2b_y, rng = _next2(rng)
            u_rr, _, rng = _next2(rng)

            ds, em_weight = scene.sample_emitter_direction(
                si.p, u0, jnp.stack([u2a_x, u2a_y], axis=-1), wavelengths,
                active_next, test_visibility=not defer, ref_n=si.n,
            )
            wo_local_em = si.to_local(ds.d)
            bsdf_val, bsdf_pdf = scene.bsdf_eval_pdf(
                si, wo_local_em, wavelengths, active_next
            )
            w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf))
            contrib = jnp.where(
                active_next[..., None], s["beta"] * bsdf_val * em_weight * w_nee[..., None], 0.0
            )
            if defer:
                # enqueue: the shadow ray (same construction as
                # scene.sample_emitter_direction's test_visibility branch)
                # rides the next bounce's fused intersect launch
                sray = spawn_ray(si.p, si.n, ds.d, maxt=ds.dist * (1.0 - 1e-3))
                pend = dict(
                    pend_o=sray.o, pend_d=sray.d, pend_maxt=sray.maxt,
                    pend_active=active_next & (ds.pdf > 0)
                    & jnp.any(contrib != 0.0, axis=-1),
                    pend_contrib=contrib,
                )
            else:
                L = L + contrib

            # ---- BSDF sampling ----
            bs, bsdf_weight = scene.bsdf_sample(
                si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), wavelengths, active_next
            )
            wo_world = si.to_world(bs.wo)
            new_ray = spawn_ray(si.p, si.n, wo_world)
            beta = s["beta"] * bsdf_weight
            eta = s["eta"] * bs.eta

            alive = active_next & (bs.pdf > 0) & jnp.any(beta > 0, axis=-1)

            # ---- Russian roulette (reference: path.cpp rr block) ----
            beta_max = jnp.max(beta, axis=-1) * eta * eta
            rr_active = s["depth"] + 1 >= self.rr_depth
            q = jnp.minimum(beta_max, 0.95)
            rr_continue = u_rr < q
            beta = jnp.where(
                (rr_active & alive)[..., None],
                beta / jnp.maximum(q, 1e-6)[..., None],
                beta,
            )
            alive = alive & (~rr_active | rr_continue)

            # ray-cast accounting for Mrays/s benchmarks: one closest-hit per
            # active lane + one shadow ray per NEE-active lane
            n_rays = s["n_rays"] + jnp.sum(s["active"].astype(jnp.float32)) + jnp.sum(
                active_next.astype(jnp.float32)
            )

            out = dict(
                depth=s["depth"] + 1,
                n_rays=n_rays,
                L=L,
                beta=beta,
                eta=eta,
                ray_o=new_ray.o,
                ray_d=new_ray.d,
                rng=rng,
                active=alive,
                prev_pdf=bs.pdf,
                prev_delta=bs.delta,
                prev_p=si.p,
            )
            if defer:
                out.update(pend)
            return out

        # lax.scan with a static trip count (not while_loop): reverse-mode
        # differentiable for tape-AD paths; PRB integrators bypass the tape
        # with custom VJPs (SURVEY.md §7).  Masked lanes make dead iterations
        # cheap; capped at max_depth like the reference's dr::Loop.
        out, _ = jax.lax.scan(
            lambda s, _: (body(s), None), state, None, length=min(max_depth, 1024)
        )
        L = out["L"]
        if defer:
            # flush the final bounce's pending shadow rays
            occluded = scene.ray_test(
                Ray(o=out["pend_o"], d=out["pend_d"], maxt=out["pend_maxt"]),
                out["pend_active"],
            )
            L = L + jnp.where(
                (out["pend_active"] & ~occluded)[..., None], out["pend_contrib"], 0.0
            )
        return L, {"n_rays": out["n_rays"]}


def _next2(rng):
    a, b, rng = rng.next_2d()
    return a, b, rng
