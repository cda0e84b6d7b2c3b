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
    # path regeneration (see path_regen_render below): dead lanes restart
    # on the pixel's next sample instead of idling to max_depth
    regenerate: bool = struct.field(pytree_node=False, default=False)
    # use_nee=False gives the pure BSDF-sampling estimator (no next-event
    # estimation, no MIS — emitter hits always counted at full weight), the
    # semantics of the reference's prb_basic
    # (src/python/python/ad/integrators/prb_basic.py).  RNG draws stay in the
    # same order either way so primal/backward replay is unaffected.
    use_nee: bool = struct.field(pytree_node=False, default=True)

    def regen_render(self, scene, seed, spp, sensor_idx, record_samples=False):
        return path_regen_render(
            self, scene, seed, spp, sensor_idx, record_samples=record_samples
        )

    def sample(self, scene, rng, ray, wavelengths, active, depth_limit=None):
        """`depth_limit` (optional [N] int32) caps each lane's path depth
        below the static max_depth — used by the projective indirect pass,
        whose depth-k boundary seeds need probe radiance carrying exactly
        the primal's REMAINING depth per lane (ad/projective.py)."""
        n = ray.o.shape[0]
        nc = scene.n_channels
        max_depth = self.max_depth if self.max_depth > 0 else 1024
        defer = self.use_nee and self.defer_nee and not scene.geometry.has_bvh
        nee = self.use_nee

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
            if nee:
                env_pdf = jnp.where(
                    s["prev_delta"], 0.0,
                    scene.pdf_emitter_direction_escaped(s["ray_d"]),
                )
                w_env = mis_weight(s["prev_pdf"], env_pdf)
            else:
                w_env = jnp.ones_like(s["prev_pdf"])
            hide = self.hide_emitters & first
            L = s["L"] + jnp.where(
                (escaped & ~hide)[..., None], s["beta"] * w_env[..., None] * env_val, 0.0
            )

            hit_em = s["active"] & si.is_valid
            em_val = scene.eval_emitter_hit(si, wavelengths)
            if nee:
                em_pdf = jnp.where(
                    s["prev_delta"], 0.0,
                    scene.pdf_emitter_direction_hit(s["prev_p"], si),
                )
                w_em = mis_weight(s["prev_pdf"], em_pdf)
            else:
                w_em = jnp.ones_like(s["prev_pdf"])
            L = L + jnp.where(
                (hit_em & ~hide)[..., None], s["beta"] * w_em[..., None] * em_val, 0.0
            )

            active_next = s["active"] & si.is_valid & (s["depth"] + 1 < max_depth)
            if depth_limit is not None:
                active_next &= s["depth"] + 1 < depth_limit

            # ---- NEE (reference: path.cpp sample_emitter_direction block) ----
            u0, u2a_x, rng = _next2(rng)
            u2a_y, u_lobe, rng = _next2(rng)
            u2b_x, u2b_y, rng = _next2(rng)
            u_rr, _, rng = _next2(rng)

            if nee:
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
                    active_next[..., None],
                    s["beta"] * bsdf_val * em_weight * w_nee[..., None], 0.0,
                )
            else:
                contrib = jnp.zeros_like(s["L"])
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
            n_rays = s["n_rays"] + jnp.sum(s["active"].astype(jnp.float32))
            if nee:
                n_rays = n_rays + jnp.sum(active_next.astype(jnp.float32))

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


# ---------------------------------------------------------------------------
# Path regeneration (wavefront compaction without dynamic shapes)
# ---------------------------------------------------------------------------
#
# The standard wavefront drags every lane through max_depth loop iterations
# with masks; in deep scenes (max_depth 32+) most lanes die early and late
# iterations compute full-width math for a few survivors (SURVEY §5
# long-context analog (a): compaction).  XLA cannot shrink arrays, so the
# TPU-native alternative is *path regeneration* (Novak et al. 2010): one lane
# per pixel, and the moment a lane's path terminates it immediately starts
# the pixel's next sample.  Lanes stay ~100% occupied; total wavefront
# iterations drop from spp * max_depth to ~spp * E[path length].
#
# RNG streams are keyed by (pixel, sample) exactly like the standard pass, so
# every individual sample's contribution is bitwise the sample it would have
# produced in the plain wavefront — regeneration changes only the schedule.

def lanes_rng(r, n):
    """Broadcast the shared dim counter per-lane: regenerated lanes sit at a
    fresh dim while continuing lanes are deeper in their streams."""
    from ..core.rng import RNG

    return RNG(
        r.seed, r.lane, dim=jnp.broadcast_to(r.dim, (n,)),
        pixel=r.pixel, sidx=r.sidx, lds=r.lds,
    )


def merge_rng(new, old, m):
    """Per-lane RNG select for regeneration (m=True takes the fresh stream)."""
    from ..core.rng import RNG

    mb = m.astype(bool)
    kw = {}
    if old.lds:
        kw = dict(
            pixel=jnp.where(mb, new.pixel, old.pixel),
            sidx=jnp.where(mb, new.sidx, old.sidx),
            lds=True,
        )
    return RNG(
        old.seed,
        jnp.where(mb, new.lane, old.lane),
        dim=jnp.where(mb, jnp.broadcast_to(new.dim, mb.shape), old.dim),
        **kw,
    )


def path_regen_render(integrator, scene, seed, spp, sensor_idx,
                      record_samples=False):
    """Forward-only regenerative wavefront for PathIntegrator-family
    integrators.  Returns (L_px [n_pixels, C] sample-summed radiance, aux).

    record_samples=True additionally stores every finished path's radiance in
    aux["L_samples"] [n_pixels, spp, C] — the per-sample primal the PRB
    regenerative backward replay needs (each replayed path must start from
    its own total radiance)."""
    from ..render_api import wavefront_for

    film = scene.film
    n = film.crop_w * film.crop_h
    nc = scene.n_channels
    max_depth = integrator.max_depth if integrator.max_depth > 0 else 1024
    pix = jnp.arange(n, dtype=jnp.uint32)
    _merge_rng = merge_rng

    rng0, ray0, _, _, _ = wavefront_for(
        scene, seed, pix, jnp.zeros((n,), jnp.uint32), jnp.uint32(spp), sensor_idx
    )
    rng0 = lanes_rng(rng0, n)

    state = dict(
        iters=jnp.asarray(0, jnp.int32),
        n_rays=jnp.asarray(0.0, jnp.float32),
        s_next=jnp.zeros((n,), jnp.uint32),
        cur_sample=jnp.zeros((n,), jnp.uint32),
        depth=jnp.zeros((n,), jnp.int32),
        L_px=jnp.zeros((n, nc), jnp.float32),
        L=jnp.zeros((n, nc), jnp.float32),
        beta=jnp.ones((n, nc), jnp.float32),
        eta=jnp.ones((n,), jnp.float32),
        ray_o=ray0.o,
        ray_d=ray0.d,
        rng=rng0,
        active=jnp.zeros((n,), bool),
        prev_pdf=jnp.ones((n,), jnp.float32),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray0.o,
    )
    if record_samples:
        state["L_samples"] = jnp.zeros((n, spp, nc), jnp.float32)

    def cond(s):
        work = s["active"] | (s["s_next"] < jnp.uint32(spp))
        return jnp.any(work) & (s["iters"] < spp * max_depth + 1)

    def body(s):
        # ---- regenerate dead lanes with remaining budget ----
        regen = (~s["active"]) & (s["s_next"] < jnp.uint32(spp))
        rng_new, ray_new, _, _, _ = wavefront_for(
            scene, seed, pix, s["s_next"], jnp.uint32(spp), sensor_idx
        )
        def sel(a, b):
            m = regen
            while m.ndim < a.ndim:
                m = m[..., None]
            return jnp.where(m, a, b)

        flush = regen & (s["s_next"] > 0)
        L_old = s["L"]
        cur_old = s["cur_sample"]
        s = dict(
            s,
            # flush the finished path's radiance into the pixel accumulator
            L_px=s["L_px"] + jnp.where(regen[..., None], s["L"], 0.0),
            L=sel(jnp.zeros_like(s["L"]), s["L"]),
            beta=sel(jnp.ones_like(s["beta"]), s["beta"]),
            eta=sel(jnp.ones_like(s["eta"]), s["eta"]),
            ray_o=sel(ray_new.o, s["ray_o"]),
            ray_d=sel(ray_new.d, s["ray_d"]),
            rng=_merge_rng(rng_new, s["rng"], regen),
            depth=sel(jnp.zeros_like(s["depth"]), s["depth"]),
            prev_pdf=sel(jnp.ones_like(s["prev_pdf"]), s["prev_pdf"]),
            prev_delta=sel(jnp.ones_like(s["prev_delta"]), s["prev_delta"]),
            prev_p=sel(ray_new.o, s["prev_p"]),
            active=s["active"] | regen,
            cur_sample=jnp.where(regen, s["s_next"], s["cur_sample"]),
            s_next=jnp.where(regen, s["s_next"] + 1, s["s_next"]),
        )
        if record_samples:
            # the flushed radiance belongs to the sample the lane held
            # BEFORE this regeneration (cur_old)
            s["L_samples"] = s["L_samples"].at[jnp.arange(n), cur_old].add(
                jnp.where(flush[..., None], L_old, 0.0)
            )


        # ---- one bounce (identical math + RNG order to sample()'s body,
        # with per-lane depth) ----
        rng = s["rng"]
        cur_ray = Ray.make(s["ray_o"], s["ray_d"])
        si = scene.ray_intersect(cur_ray, s["active"])
        first = s["depth"] == 0

        nee = integrator.use_nee
        escaped = s["active"] & ~si.is_valid
        env_val = scene.eval_environment(s["ray_d"], None)
        if nee:
            env_pdf = jnp.where(
                s["prev_delta"], 0.0, scene.pdf_emitter_direction_escaped(s["ray_d"])
            )
            w_env = mis_weight(s["prev_pdf"], env_pdf)
        else:
            w_env = jnp.ones_like(s["prev_pdf"])
        hide = integrator.hide_emitters & first
        L = s["L"] + jnp.where(
            (escaped & ~hide)[..., None], s["beta"] * w_env[..., None] * env_val, 0.0
        )

        hit_em = s["active"] & si.is_valid
        em_val = scene.eval_emitter_hit(si, None)
        if nee:
            em_pdf = jnp.where(
                s["prev_delta"], 0.0, scene.pdf_emitter_direction_hit(s["prev_p"], si)
            )
            w_em = mis_weight(s["prev_pdf"], em_pdf)
        else:
            w_em = jnp.ones_like(s["prev_pdf"])
        L = L + jnp.where(
            (hit_em & ~hide)[..., None], s["beta"] * w_em[..., None] * em_val, 0.0
        )

        active_next = s["active"] & si.is_valid & (s["depth"] + 1 < max_depth)

        u0, u2a_x, rng = _next2(rng)
        u2a_y, u_lobe, rng = _next2(rng)
        u2b_x, u2b_y, rng = _next2(rng)
        u_rr, _, rng = _next2(rng)

        if nee:
            ds, em_weight = scene.sample_emitter_direction(
                si.p, u0, jnp.stack([u2a_x, u2a_y], axis=-1), None,
                active_next, test_visibility=True, ref_n=si.n,
            )
            wo_local_em = si.to_local(ds.d)
            bsdf_val, bsdf_pdf = scene.bsdf_eval_pdf(si, wo_local_em, None, active_next)
            w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf))
            L = L + jnp.where(
                active_next[..., None],
                s["beta"] * bsdf_val * em_weight * w_nee[..., None], 0.0,
            )

        bs, bsdf_weight = scene.bsdf_sample(
            si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), None, active_next
        )
        wo_world = si.to_world(bs.wo)
        new_ray = spawn_ray(si.p, si.n, wo_world)
        beta = s["beta"] * bsdf_weight
        eta = s["eta"] * bs.eta
        alive = active_next & (bs.pdf > 0) & jnp.any(beta > 0, axis=-1)

        beta_max = jnp.max(beta, axis=-1) * eta * eta
        rr_active = s["depth"] + 1 >= integrator.rr_depth
        q = jnp.minimum(beta_max, 0.95)
        rr_continue = u_rr < q
        beta = jnp.where(
            (rr_active & alive)[..., None],
            beta / jnp.maximum(q, 1e-6)[..., None], beta,
        )
        alive = alive & (~rr_active | rr_continue)

        n_rays = s["n_rays"] + jnp.sum(s["active"].astype(jnp.float32))
        if nee:
            n_rays = n_rays + jnp.sum(active_next.astype(jnp.float32))

        return dict(
            s,
            iters=s["iters"] + 1,
            n_rays=n_rays,
            depth=s["depth"] + 1,
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

    out = jax.lax.while_loop(cond, body, state)
    # lanes can only exit the loop inactive, so out["L"] holds the final
    # path's radiance for every lane; add it unconditionally-but-masked
    final = jnp.where(out["active"][..., None], 0.0, out["L"])
    L_px = out["L_px"] + final
    aux = {"n_rays": out["n_rays"], "wavefront_iters": out["iters"]}
    if record_samples:
        aux["L_samples"] = out["L_samples"].at[
            jnp.arange(n), out["cur_sample"]
        ].add(jnp.where((out["s_next"] > 0)[..., None], final, 0.0))
    return L_px, aux
