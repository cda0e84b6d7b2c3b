"""Atmosphere-Ocean System volumetric path tracer (fork centerpiece;
reference: src/integrators/volpathaos.cpp:38-473).

Specialization of volpath for: a single *directional* emitter above the scene
and at most one refractive interface (the ocean surface, assumed aligned with
the world x-y plane — reference: volpathaos.cpp:267 'Assumes surface is
aligned with x-y plane').  Differences from volpath:

  * NEE through the refractive boundary: when a `refractive_bsdf` lies
    between the current vertex and the emitter, sample the transmission lobe
    of that BSDF with si.wi = emitter direction and aim the shadow ray at
    -bs.wo — the direction that *refracts into* the emitter — dividing by its
    pdf (volpathaos.cpp:305-337, with the bs.pdf > eps guard at :328).
  * `refractive_bsdf` state toggles when a bounce crosses the horizontal
    interface (cos_z(old) * cos_z(new) > 0 after a non-null scatter,
    volpathaos.cpp:264-291).
  * The NEE shadow walk crosses the one non-null surface, multiplying the
    transmittance by bsdf.eval toward the emitter direction and bending the
    ray (volpathaos.cpp:415-440); media use ratio tracking (:349-452).
  * NEE contributions use plain weights (no MIS vs phase/BSDF pdf — the
    emitter is Dirac; emitter hits never occur), matching the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..render.records import MediumInteraction, Ray, spawn_ray
from ..render.spectrum_ops import get_ops, depolarizer_weight, identity_weight
from .path import mis_weight, _next2
from .volpath import (
    VolPathIntegrator,
    estimate_transmittance,
    index_spectrum,
    sample_channel,
    track_segment,
    track_segment_ratio,
)


def _refractive_nee_direction(scene, refr_idx, emitter_d, u2, active):
    """Sample the direction that refracts into emitter_d at the interface
    (reference: volpathaos.cpp:305-337).  The interface frame is assumed to be
    the world frame (normal +z).  Returns (d_nee [N,3], inv_pdf [N], valid)."""
    n = emitter_d.shape[0]
    d_out = emitter_d
    inv_pdf = jnp.ones((n,), jnp.float32)
    valid = jnp.ones((n,), bool)
    for i, b in enumerate(scene.bsdfs):
        if not hasattr(b, "sample_transmission"):
            continue
        m = (refr_idx == i) & active
        wo, pdf = b.sample_transmission(u2, emitter_d)
        ok = pdf > 1e-7                      # eps guard (volpathaos.cpp:328)
        d_out = jnp.where(m[..., None], -wo, d_out)
        inv_pdf = jnp.where(m, jnp.where(ok, 1.0 / jnp.maximum(pdf, 1e-7), 0.0), inv_pdf)
        valid = jnp.where(m, ok, valid)
    return d_out, inv_pdf, valid


def estimate_transmittance_aos(
    scene, p0, d0, emitter_d, dist, medium0, channel, rng, active, ops,
    wavelengths=None, max_crossings=6, steps_per_segment=32,
    detach_flight=False,
):
    """AOS shadow walk: ratio tracking through media + null interfaces, with
    direction change at the one non-null (refractive) surface
    (reference: volpathaos.cpp:349-452).  In polarized mode the accumulated
    transmittance is a Mueller chain T = M_1 @ M_2 @ ... in walk order.

    detach_flight: PRB attached-evaluation mode — detached collision
    positions/decisions, attached sigma_n and refractive-BSDF factors
    (see track_segment_ratio)."""
    n = p0.shape[0]
    nc = scene.n_channels

    T = ops.one(n, nc)
    state = dict(
        p=p0, d=d0,
        remaining=dist * (1.0 - 1e-3),
        medium=medium0,
        alive=active,
        rng=rng,
    )

    for _ in range(max_crossings):
        ray = spawn_ray(state["p"], state["d"], state["d"], maxt=state["remaining"])
        si = scene.ray_intersect(ray, state["alive"])
        t_surf = jnp.where(si.is_valid, si.t, jnp.inf)
        seg_len = jnp.minimum(t_surf, state["remaining"])

        T_seg, rng = track_segment_ratio(
            scene, ray.o, state["d"], seg_len, state["medium"], channel,
            state["rng"], state["alive"], steps_per_segment,
            detach_flight=detach_flight,
        )
        T = ops.mul_scalar(T, jnp.where(state["alive"][..., None], T_seg, 1.0))

        hit_surface = state["alive"] & si.is_valid & (t_surf < state["remaining"])
        is_null = scene.is_null_bsdf(si)
        cross_null = hit_surface & is_null
        cross_refr = hit_surface & ~is_null

        # refractive interface: transmittance *= bsdf.eval(toward emitter),
        # then continue along emitter_d (volpathaos.cpp:421-431)
        wo_em = si.to_local(emitter_d)
        if ops.polarized:
            M_refr, _ = scene.bsdf_eval_pdf_pol(si, wo_em, wavelengths, cross_refr)
            T = jnp.where(cross_refr[..., None, None, None], T @ M_refr, T)
        else:
            v_refr, _ = scene.bsdf_eval_pdf(si, wo_em, wavelengths, cross_refr)
            T = jnp.where(cross_refr[..., None], T * v_refr, T)
        new_d = jnp.where(cross_refr[..., None], emitter_d, state["d"])

        new_medium = jnp.where(
            hit_surface, scene.medium_transition(si, new_d, state["medium"]),
            state["medium"],
        )
        adv = jnp.where(hit_surface, t_surf, 0.0)
        Tmax = jnp.max(ops.intensity_beta(T), axis=-1)
        state = dict(
            p=state["p"] + (adv + 1e-4)[..., None] * state["d"],
            d=new_d,
            remaining=state["remaining"] - adv,
            medium=new_medium,
            alive=(cross_null | cross_refr) & (Tmax > 0),
            rng=rng,
        )

    zeroT = ops.mul_scalar(T, jnp.zeros((n, nc), jnp.float32))
    T = ops.where_beta(state["alive"], zeroT, T)  # budget exceeded -> 0
    T = ops.where_beta(active, T, zeroT)
    return T, state["rng"]


@struct.dataclass
class VolPathAOSIntegrator(VolPathIntegrator):
    """volpathaos (and the primal of prb_volpathaos)."""

    def sample(self, scene, rng, ray, wavelengths, active):
        n = ray.o.shape[0]
        nc = scene.n_channels
        ops = get_ops(scene.polarized)
        max_depth = self.max_depth if self.max_depth > 0 else 64
        max_segments = self.max_segments or (max_depth + 8)

        u_ch, _, rng = _next2(rng)
        channel = sample_channel(u_ch, nc)

        state = dict(
            depth=jnp.zeros((n,), jnp.int32),
            n_rays=jnp.asarray(0.0, jnp.float32),
            L=ops.zero_radiance(n, nc),
            beta=ops.one(n, nc),
            ray_o=ray.o,
            ray_d=ray.d,
            medium=jnp.full((n,), scene.camera_medium, jnp.int32),
            refr=jnp.full((n,), -1, jnp.int32),   # refractive_bsdf index state
            channel=channel,
            rng=rng,
            active=active,
            prev_pdf=jnp.ones((n,), jnp.float32),
            prev_delta=jnp.ones((n,), bool),
            prev_p=ray.o,
        )

        def body(s, _):
            return self._bounce(scene, ops, wavelengths, max_depth, s), None

        out, _ = jax.lax.scan(body, state, None, length=max_segments)
        return out["L"], {"n_rays": out["n_rays"]}

    def _regen_extra(self, n, scene):
        """Extra per-lane state the regenerative driver must reset on
        sample restart (the refractive-interface memory)."""
        return {"refr": jnp.full((n,), -1, jnp.int32)}

    def _bounce(self, scene, ops, wavelengths, max_depth, s):
        """One AOS wavefront step (shared by sample() and the regenerative
        driver; see VolPathIntegrator._bounce)."""
        channel = s["channel"]
        wavelengths = s.get("wavelengths", wavelengths)
        n = s["ray_o"].shape[0]
        # static map: which bsdf indices are refractive interfaces
        # (transmission-capable and not a null medium boundary)
        refr_flags = [
            b.flags_transmission and type(b).__name__ != "NullBSDF"
            for b in scene.bsdfs
        ]
        rng = s["rng"]
        cur_ray = Ray.make(s["ray_o"], s["ray_d"])
        si = scene.ray_intersect(cur_ray, s["active"])
        t_surf = jnp.where(si.is_valid, si.t, jnp.inf)

        reached_end, real, t_real, beta_f, rng = track_segment(
            scene, s["ray_o"], s["ray_d"], t_surf, s["medium"], channel,
            rng, s["active"], self.track_steps,
        )
        beta = ops.mul_scalar(
            s["beta"], jnp.where(s["active"][..., None], beta_f, 1.0)
        )

        surface_event = s["active"] & reached_end & si.is_valid
        escaped = s["active"] & reached_end & ~si.is_valid

        p_med = s["ray_o"] + t_real[..., None] * s["ray_d"]
        mei = MediumInteraction.make(
            jnp.where(real, t_real, jnp.inf), p_med, s["ray_d"], s["medium"]
        )
        phase_idx = scene.medium_phase_of(s["medium"])

        u0, u2a_x, rng = _next2(rng)
        u2a_y, u_lobe, rng = _next2(rng)
        u2b_x, u2b_y, rng = _next2(rng)
        u2r_x, u2r_y, rng = _next2(rng)
        u_rr, _, rng = _next2(rng)

        # ---- environment escape (constant env if present) ----
        L = s["L"]
        env_val = scene.eval_environment(s["ray_d"], wavelengths)
        env_pdf = jnp.where(
            s["prev_delta"], 0.0, scene.pdf_emitter_direction_escaped(s["ray_d"])
        )
        w_env = mis_weight(s["prev_pdf"], env_pdf)
        L = L + ops.where_rad(
            escaped, ops.emit(beta, env_val * w_env[..., None]), jnp.zeros_like(L)
        )
        em_val = scene.eval_emitter_hit(si, wavelengths)
        em_pdf = jnp.where(
            s["prev_delta"], 0.0, scene.pdf_emitter_direction_hit(s["prev_p"], si)
        )
        w_hit = mis_weight(s["prev_pdf"], em_pdf)
        L = L + ops.where_rad(
            surface_event, ops.emit(beta, em_val * w_hit[..., None]), jnp.zeros_like(L)
        )

        depth_ok = s["depth"] + 1 < max_depth
        is_null_surf = scene.is_null_bsdf(si)
        null_cross = surface_event & is_null_surf
        scatter_surf = surface_event & ~is_null_surf & depth_ok
        scatter_med = real & depth_ok

        # ---- AOS NEE ----
        # surface NEE only for reflection-side events (diffuse or
        # refractive with si.wi.z > 0; volpathaos.cpp:237-240)
        nee_surf = scatter_surf & (si.wi[..., 2] > 0)
        nee_active = scatter_med | nee_surf
        ref_p = jnp.where(scatter_med[..., None], p_med, si.p)
        ds, em_weight = scene.sample_emitter_direction(
            ref_p, u0, jnp.stack([u2a_x, u2a_y], axis=-1), wavelengths,
            nee_active, test_visibility=False,
        )
        emitter_d = ds.d

        # refraction proposal when a refractive interface lies toward
        # the emitter (volpathaos.cpp:305-337)
        has_refr = nee_active & (s["refr"] >= 0)
        d_refr, inv_pdf_refr, refr_ok = _refractive_nee_direction(
            scene, s["refr"], emitter_d, jnp.stack([u2r_x, u2r_y], axis=-1), has_refr
        )
        d_nee = jnp.where(has_refr[..., None], d_refr, emitter_d)
        em_weight = jnp.where(
            has_refr[..., None], em_weight * inv_pdf_refr[..., None], em_weight
        )
        nee_ok = jnp.where(has_refr, refr_ok, jnp.ones_like(refr_ok))
        nee_active = nee_active & nee_ok

        nee_medium = jnp.where(
            scatter_surf, scene.medium_transition(si, d_nee, s["medium"]),
            s["medium"],
        )
        p_nee = jnp.where(
            scatter_surf[..., None],
            si.p + jnp.sign(jnp.sum(si.n * d_nee, axis=-1))[..., None] * 1e-4 * si.n,
            p_med,
        )
        walk_dist = jnp.where(
            has_refr,
            4.0 * jnp.maximum(scene.bbox_radius, 1.0),  # bent path: walk far
            ds.dist,
        )
        T_nee, rng = estimate_transmittance_aos(
            scene, p_nee, d_nee, emitter_d, walk_dist,
            nee_medium, channel, rng, nee_active, ops,
            wavelengths=wavelengths,
            max_crossings=self.nee_crossings, steps_per_segment=self.nee_steps,
        )

        wo_med = mei.to_local(d_nee)
        wo_surf = si.to_local(d_nee)
        if ops.polarized:
            ph_val, _ = scene.phase_eval_pdf_pol(
                phase_idx, mei, wo_med, wavelengths, scatter_med
            )
            b_val, _ = scene.bsdf_eval_pdf_pol(si, wo_surf, wavelengths, nee_surf)
            f_nee = jnp.where(scatter_med[..., None, None, None], ph_val, b_val)
            # contribution: beta @ f_nee @ T_nee @ s_emit (Dirac emitter:
            # no MIS, volpathaos.cpp:249)
            chain = beta @ f_nee @ T_nee
            contrib = chain[..., :, 0] * em_weight[..., None]
            L = L + jnp.where(nee_active[..., None, None], contrib, 0.0)
        else:
            ph_val, _ = scene.phase_eval_pdf(
                phase_idx, mei, wo_med, wavelengths, scatter_med
            )
            b_val, _ = scene.bsdf_eval_pdf(si, wo_surf, wavelengths, nee_surf)
            f_nee = jnp.where(scatter_med[..., None], ph_val, b_val)
            contrib = beta * f_nee * T_nee * em_weight
            L = L + jnp.where(nee_active[..., None], contrib, 0.0)

        # ---- direction sampling (same as volpath) ----
        if ops.polarized:
            wo_ph, w_ph, pdf_ph = scene.phase_sample_pol(
                phase_idx, mei, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1),
                wavelengths, scatter_med,
            )
            bs, bw = scene.bsdf_sample_pol(
                si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), wavelengths,
                scatter_surf,
            )
        else:
            wo_ph, w_ph, pdf_ph = scene.phase_sample(
                phase_idx, mei, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1),
                wavelengths, scatter_med,
            )
            bs, bw = scene.bsdf_sample(
                si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), wavelengths,
                scatter_surf,
            )
        d_med = mei.to_world(wo_ph)
        d_surf = si.to_world(bs.wo)

        new_d = jnp.where(
            scatter_med[..., None], d_med,
            jnp.where(scatter_surf[..., None], d_surf, s["ray_d"]),
        )
        new_d = jnp.where(null_cross[..., None], s["ray_d"], new_d)
        o_surf = spawn_ray(si.p, si.n, new_d).o
        new_o = jnp.where(
            scatter_med[..., None], p_med,
            jnp.where(surface_event[..., None], o_surf, s["ray_o"]),
        )

        beta = ops.where_beta(scatter_med, ops.apply(beta, w_ph), beta)
        beta = ops.where_beta(scatter_surf, ops.apply(beta, bw), beta)

        new_medium = jnp.where(
            null_cross | scatter_surf,
            scene.medium_transition(si, new_d, s["medium"]),
            s["medium"],
        )

        # ---- refractive_bsdf state toggle (volpathaos.cpp:264-291) ----
        refracted = scatter_surf & (s["ray_d"][..., 2] * new_d[..., 2] > 0)
        b_idx = scene.bsdf_index_at(si)
        is_refr_bsdf = jnp.zeros((n,), bool)
        for i, fl in enumerate(refr_flags):
            if fl:
                is_refr_bsdf = is_refr_bsdf | (b_idx == i)
        set_refr = refracted & is_refr_bsdf & (s["refr"] < 0)
        unset_refr = refracted & (s["refr"] >= 0)
        new_refr = jnp.where(
            set_refr, b_idx, jnp.where(unset_refr, -1, s["refr"])
        )

        new_depth = s["depth"] + (scatter_med | scatter_surf).astype(jnp.int32)
        new_prev_pdf = jnp.where(
            scatter_med, pdf_ph, jnp.where(scatter_surf, bs.pdf, s["prev_pdf"])
        )
        new_prev_delta = jnp.where(
            scatter_med, False, jnp.where(scatter_surf, bs.delta, s["prev_delta"])
        )
        new_prev_p = jnp.where(nee_active[..., None], ref_p, s["prev_p"])

        beta_int = ops.intensity_beta(beta)
        alive = s["active"] & ~escaped
        alive = alive & ~(scatter_surf & (bs.pdf <= 0))
        alive = alive & ~(scatter_med & (pdf_ph <= 0))
        alive = alive & ~(surface_event & ~is_null_surf & ~depth_ok)
        alive = alive & ~(real & ~depth_ok)
        alive = alive & (jnp.max(beta_int, axis=-1) > 0)

        beta_max = jnp.max(beta_int, axis=-1)
        rr_active = (new_depth >= self.rr_depth) & (scatter_med | scatter_surf)
        q = jnp.minimum(beta_max, 0.95)
        rr_continue = u_rr < q
        beta = ops.where_beta(
            rr_active & alive,
            ops.mul_scalar(beta, 1.0 / jnp.maximum(q, 1e-6)[..., None]),
            beta,
        )
        alive = alive & (~rr_active | rr_continue)

        n_rays = s["n_rays"] + jnp.sum(s["active"].astype(jnp.float32)) + jnp.sum(
            nee_active.astype(jnp.float32)
        )

        return dict(
            s,
            depth=new_depth, n_rays=n_rays, L=L, beta=beta,
            ray_o=new_o, ray_d=new_d, medium=new_medium,
            refr=new_refr, rng=rng, active=alive,
            prev_pdf=new_prev_pdf, prev_delta=new_prev_delta,
            prev_p=new_prev_p,
        )
