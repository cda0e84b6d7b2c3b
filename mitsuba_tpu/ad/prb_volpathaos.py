"""Atmosphere-Ocean PRB replay: prb_volpathaos
(reference: src/python/python/ad/integrators/prb_volpathaos.py:11-509 —
the polarized AOS replay with refractive-interface NEE).

Backward pass = a second ray-streaming scan replaying the AOS primal
(integrators/volpathaos.py) bit-exactly — including the refraction-proposal
RNG draws and the bent shadow walk — contracting the film adjoint with the
iteration's attached local terms per jax.vjp:

  w_seg   scalar delta-tracking ratios on the remaining radiance
  Le      environment / emitter-hit emission through the detached chain
  C_nee   attached phase/bsdf value x attached emitter irradiance x the
          attached AOS shadow-walk transmittance (ratio-tracked sigma_n AND
          the refractive-crossing BSDF eval attached; refraction-proposal
          pdf detached, volpathaos.cpp:305-337)
  w_dir   per-event attached-eval / detached-pdf intensity ratio on the
          remaining suffix (see ad/prb_polarized.py for why per-event)

Works in both unpolarized ([N, C] radiance) and polarized ([N, C, 4] Stokes
with [N, C, 4, 4] Mueller chains) variants via spectrum_ops, like the primal.
Gradient scope matches the reference: medium/phase/emitter/reflectance
parameters; not shapes or perfectly specular parameters (detached sampling).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..integrators.path import mis_weight, _next2
from ..integrators.volpath import sample_channel, track_segment
from ..integrators.volpathaos import (
    VolPathAOSIntegrator,
    _refractive_nee_direction,
    estimate_transmittance_aos,
)
from ..render.records import MediumInteraction, Ray, spawn_ray
from ..render.spectrum_ops import get_ops
from .prb import add_cotangent, zero_float_grads


@struct.dataclass
class PRBVolpathAOSIntegrator(VolPathAOSIntegrator):
    """Detached-sampling AOS PRB.  The primal is the shared volpathaos."""

    is_prb = True

    def regen_backward(self, scene, seed, spp, sensor_idx, dL_px, L_samples):
        from .prbvolpath import volumetric_regen_backward

        return volumetric_regen_backward(
            self, scene, seed, spp, sensor_idx, dL_px, L_samples
        )

    def sample_backward(self, scene, rng, ray, wavelengths, dL, L_primal, active):
        n = ray.o.shape[0]
        nc = scene.n_channels
        ops = get_ops(scene.polarized)
        scene_d = jax.lax.stop_gradient(scene)
        dL = jax.lax.stop_gradient(dL)
        max_depth = self.max_depth if self.max_depth > 0 else 64
        max_segments = self.max_segments or (max_depth + 8)

        u_ch, _, rng = _next2(rng)
        channel = sample_channel(u_ch, nc)

        grad0 = zero_float_grads(scene)

        state = dict(
            depth=jnp.zeros((n,), jnp.int32),
            L=jax.lax.stop_gradient(L_primal),
            beta=ops.one(n, nc),
            ray_o=ray.o,
            ray_d=ray.d,
            medium=jnp.full((n,), scene.camera_medium, jnp.int32),
            refr=jnp.full((n,), -1, jnp.int32),
            channel=channel,
            rng=rng,
            active=active,
            prev_pdf=jnp.ones((n,), jnp.float32),
            prev_delta=jnp.ones((n,), bool),
            prev_p=ray.o,
            grad=grad0,
        )

        def body(s, _):
            return self._bwd_bounce(scene_d, scene, wavelengths, dL, max_depth, s), None

        out, _ = jax.lax.scan(body, state, None, length=max_segments)
        return out["grad"]

    def _bwd_bounce(self, scene_d, scene, wavelengths, dL, max_depth, s):
        """One AOS PRB replay step (scan body of sample_backward, shared
        with the regenerative backward driver).  `s['depth']`, `s['channel']`
        and `s['refr']` are per-lane."""
        ops = get_ops(scene.polarized)
        n = s["ray_o"].shape[0]
        channel = s["channel"]
        wavelengths = s.get("wavelengths", wavelengths)
        dL = s.get("dL", dL)
        refr_flags = [
            b.flags_transmission and type(b).__name__ != "NullBSDF"
            for b in scene.bsdfs
        ]
        rng_seg = s["rng"]                            # replay snapshot
        cur_ray = Ray.make(s["ray_o"], s["ray_d"])
        si = scene_d.ray_intersect(cur_ray, s["active"])
        t_surf = jnp.where(si.is_valid, si.t, jnp.inf)

        L_start = s["L"]

        reached_end, real, t_real, beta_f_det, rng = track_segment(
            scene_d, s["ray_o"], s["ray_d"], t_surf, s["medium"], channel,
            rng_seg, s["active"], self.track_steps,
        )
        seg_mask = s["active"] & (s["medium"] >= 0)
        beta = ops.mul_scalar(
            s["beta"], jnp.where(s["active"][..., None], beta_f_det, 1.0)
        )

        surface_event = s["active"] & reached_end & si.is_valid
        escaped = s["active"] & reached_end & ~si.is_valid

        p_med = s["ray_o"] + t_real[..., None] * s["ray_d"]
        mei = MediumInteraction.make(
            jnp.where(real, t_real, jnp.inf), p_med, s["ray_d"], s["medium"]
        )
        phase_idx = scene_d.medium_phase_of(s["medium"])

        # fixed-order draws — EXACTLY the AOS primal's order
        u0, u2a_x, rng = _next2(rng)
        u2a_y, u_lobe, rng = _next2(rng)
        u2b_x, u2b_y, rng = _next2(rng)
        u2r_x, u2r_y, rng = _next2(rng)
        u_rr, _, rng = _next2(rng)

        # ---- detached contributions (mirror primal volpathaos) ----
        env_val_d = scene_d.eval_environment(s["ray_d"], wavelengths)
        env_pdf = jnp.where(
            s["prev_delta"], 0.0, scene_d.pdf_emitter_direction_escaped(s["ray_d"])
        )
        w_env = mis_weight(s["prev_pdf"], env_pdf)
        em_val_d = scene_d.eval_emitter_hit(si, wavelengths)
        em_pdf = jnp.where(
            s["prev_delta"], 0.0, scene_d.pdf_emitter_direction_hit(s["prev_p"], si)
        )
        w_hit = mis_weight(s["prev_pdf"], em_pdf)
        zero_rad = jnp.zeros_like(L_start)
        Le_det = (
            ops.where_rad(
                escaped, ops.emit(beta, env_val_d * w_env[..., None]), zero_rad
            )
            + ops.where_rad(
                surface_event, ops.emit(beta, em_val_d * w_hit[..., None]), zero_rad
            )
        )

        depth_ok = s["depth"] + 1 < max_depth
        is_null_surf = scene_d.is_null_bsdf(si)
        null_cross = surface_event & is_null_surf
        scatter_surf = surface_event & ~is_null_surf & depth_ok
        scatter_med = real & depth_ok

        nee_surf = scatter_surf & (si.wi[..., 2] > 0)
        nee_active = scatter_med | nee_surf
        ref_p = jnp.where(scatter_med[..., None], p_med, si.p)
        ds, em_weight_d = scene_d.sample_emitter_direction(
            ref_p, u0, jnp.stack([u2a_x, u2a_y], axis=-1), wavelengths,
            nee_active, test_visibility=False,
        )
        emitter_d = ds.d

        has_refr = nee_active & (s["refr"] >= 0)
        d_refr, inv_pdf_refr, refr_ok = _refractive_nee_direction(
            scene_d, s["refr"], emitter_d,
            jnp.stack([u2r_x, u2r_y], axis=-1), has_refr,
        )
        d_nee = jnp.where(has_refr[..., None], d_refr, emitter_d)
        em_weight_d = jnp.where(
            has_refr[..., None], em_weight_d * inv_pdf_refr[..., None], em_weight_d
        )
        nee_ok = jnp.where(has_refr, refr_ok, jnp.ones_like(refr_ok))
        nee_active = nee_active & nee_ok

        nee_medium = jnp.where(
            scatter_surf, scene_d.medium_transition(si, d_nee, s["medium"]),
            s["medium"],
        )
        p_nee = jnp.where(
            scatter_surf[..., None],
            si.p + jnp.sign(jnp.sum(si.n * d_nee, axis=-1))[..., None] * 1e-4 * si.n,
            p_med,
        )
        walk_dist = jnp.where(
            has_refr, 4.0 * jnp.maximum(scene_d.bbox_radius, 1.0), ds.dist
        )
        rng_nee = rng                                 # replay snapshot
        T_nee_det, rng = estimate_transmittance_aos(
            scene_d, p_nee, d_nee, emitter_d, walk_dist,
            nee_medium, channel, rng_nee, nee_active, ops,
            wavelengths=wavelengths,
            max_crossings=self.nee_crossings, steps_per_segment=self.nee_steps,
        )

        wo_med = mei.to_local(d_nee)
        wo_surf = si.to_local(d_nee)

        def nee_contrib(sc, f, T, em_w):
            if ops.polarized:
                chain = beta @ f @ T
                c = chain[..., :, 0] * em_w[..., None]
                return jnp.where(nee_active[..., None, None], c, 0.0)
            c = beta * f * T * em_w
            return jnp.where(nee_active[..., None], c, 0.0)

        if ops.polarized:
            ph_val_d, _ = scene_d.phase_eval_pdf_pol(
                phase_idx, mei, wo_med, wavelengths, scatter_med
            )
            b_val_d, _ = scene_d.bsdf_eval_pdf_pol(si, wo_surf, wavelengths, nee_surf)
            f_nee_d = jnp.where(
                scatter_med[..., None, None, None], ph_val_d, b_val_d
            )
        else:
            ph_val_d, _ = scene_d.phase_eval_pdf(
                phase_idx, mei, wo_med, wavelengths, scatter_med
            )
            b_val_d, _ = scene_d.bsdf_eval_pdf(si, wo_surf, wavelengths, nee_surf)
            f_nee_d = jnp.where(scatter_med[..., None], ph_val_d, b_val_d)
        C_nee_det = nee_contrib(scene_d, f_nee_d, T_nee_det, em_weight_d)

        # detached direction sampling
        if ops.polarized:
            wo_ph, w_ph_det, pdf_ph = scene_d.phase_sample_pol(
                phase_idx, mei, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1),
                wavelengths, scatter_med,
            )
            bs, bw_det = scene_d.bsdf_sample_pol(
                si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), wavelengths,
                scatter_surf,
            )
        else:
            wo_ph, w_ph_det, pdf_ph = scene_d.phase_sample(
                phase_idx, mei, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1),
                wavelengths, scatter_med,
            )
            bs, bw_det = scene_d.bsdf_sample(
                si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), wavelengths,
                scatter_surf,
            )
        d_med = mei.to_world(wo_ph)
        d_surf = si.to_world(bs.wo)

        em_val_plain_d = scene_d.eval_emitter_sample(ds, wavelengths)
        em_ratio = jnp.where(
            em_val_plain_d > 1e-20,
            em_weight_d / jnp.maximum(em_val_plain_d, 1e-20),
            0.0,
        )

        L_next = L_start - Le_det - C_nee_det

        inv_seg = jnp.where(
            beta_f_det > 1e-20, 1.0 / jnp.maximum(beta_f_det, 1e-20), 0.0
        )
        if ops.polarized:
            w_dir_det = jnp.where(
                scatter_med[..., None, None, None], w_ph_det, bw_det
            )
            w_dir_int = w_dir_det[..., 0, 0]
        else:
            w_dir_det = jnp.where(scatter_med[..., None], w_ph_det, bw_det)
            w_dir_int = w_dir_det
        inv_dir = jnp.where(
            w_dir_int > 1e-12, 1.0 / jnp.maximum(w_dir_int, 1e-12), 0.0
        )
        beta_det = beta

        def attached(sc):
            # 1. segment tracking ratios on the remaining radiance
            _, _, _, bf_att, _ = track_segment(
                sc, s["ray_o"], s["ray_d"], t_surf, s["medium"], channel,
                rng_seg, s["active"], self.track_steps, detach_flight=True,
            )
            ratio_seg = bf_att * inv_seg
            if ops.polarized:
                ratio_seg = ratio_seg[..., None]
                seg_m = seg_mask[..., None, None]
            else:
                seg_m = seg_mask[..., None]
            term_seg = jnp.where(seg_m, dL * L_start * ratio_seg, 0.0)

            # 2. attached emission
            env_a = sc.eval_environment(s["ray_d"], wavelengths)
            em_hit_a = sc.eval_emitter_hit(si, wavelengths)
            Le_a = (
                ops.where_rad(
                    escaped, ops.emit(beta_det, env_a * w_env[..., None]), zero_rad
                )
                + ops.where_rad(
                    surface_event,
                    ops.emit(beta_det, em_hit_a * w_hit[..., None]), zero_rad,
                )
            )
            term_le = dL * Le_a

            # 3. attached NEE: phase/bsdf value, emitter irradiance, and
            # the AOS shadow walk (attached sigma_n + refractive eval;
            # refraction-proposal pdf stays detached via em_ratio)
            if ops.polarized:
                ph_a, _ = sc.phase_eval_pdf_pol(
                    phase_idx, mei, wo_med, wavelengths, scatter_med
                )
                b_a, _ = sc.bsdf_eval_pdf_pol(si, wo_surf, wavelengths, nee_surf)
                f_a = jnp.where(scatter_med[..., None, None, None], ph_a, b_a)
            else:
                ph_a, _ = sc.phase_eval_pdf(
                    phase_idx, mei, wo_med, wavelengths, scatter_med
                )
                b_a, _ = sc.bsdf_eval_pdf(si, wo_surf, wavelengths, nee_surf)
                f_a = jnp.where(scatter_med[..., None], ph_a, b_a)
            em_a = sc.eval_emitter_sample(ds, wavelengths) * em_ratio
            T_a, _ = estimate_transmittance_aos(
                sc, p_nee, d_nee, emitter_d, walk_dist,
                nee_medium, channel, rng_nee, nee_active, ops,
                wavelengths=wavelengths,
                max_crossings=self.nee_crossings,
                steps_per_segment=self.nee_steps, detach_flight=True,
            )
            term_nee = dL * nee_contrib(sc, f_a, T_a, em_a)

            # 4. per-event attached-eval/detached-pdf intensity ratio on
            # the remaining suffix
            if ops.polarized:
                ph_dir_a, _ = sc.phase_eval_pdf_pol(
                    phase_idx, mei, wo_ph, wavelengths, scatter_med
                )
                b_dir_a, _ = sc.bsdf_eval_pdf_pol(
                    si, bs.wo, wavelengths, scatter_surf
                )
                f_dir_a = jnp.where(
                    scatter_med[..., None, None, None], ph_dir_a, b_dir_a
                )
                f_dir_I = f_dir_a[..., 0, 0]
            else:
                ph_dir_a, _ = sc.phase_eval_pdf(
                    phase_idx, mei, wo_ph, wavelengths, scatter_med
                )
                b_dir_a, _ = sc.bsdf_eval_pdf(si, bs.wo, wavelengths, scatter_surf)
                f_dir_I = jnp.where(scatter_med[..., None], ph_dir_a, b_dir_a)
            pdf_dir_det = jax.lax.stop_gradient(
                jnp.where(scatter_med, pdf_ph, bs.pdf)
            )
            ratio_dir = (
                f_dir_I / jnp.maximum(pdf_dir_det, 1e-12)[..., None]
            ) * inv_dir
            if ops.polarized:
                ratio_dir = ratio_dir[..., None]
                dir_m = (scatter_med | scatter_surf)[..., None, None]
            else:
                dir_m = (scatter_med | scatter_surf)[..., None]
            term_dir = jnp.where(
                dir_m, dL * jax.lax.stop_gradient(L_next) * ratio_dir, 0.0
            )
            return (
                jnp.sum(term_seg) + jnp.sum(term_le)
                + jnp.sum(term_nee) + jnp.sum(term_dir)
            )

        _, vjp_fn = jax.vjp(attached, scene)
        (ct,) = vjp_fn(jnp.asarray(1.0, jnp.float32))
        grad = add_cotangent(s["grad"], ct, scene)

        # ---- advance detached state exactly like the primal ----
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

        beta = ops.where_beta(scatter_med, ops.apply(beta, w_ph_det), beta)
        beta = ops.where_beta(scatter_surf, ops.apply(beta, bw_det), beta)

        new_medium = jnp.where(
            null_cross | scatter_surf,
            scene_d.medium_transition(si, new_d, s["medium"]),
            s["medium"],
        )

        refracted = scatter_surf & (s["ray_d"][..., 2] * new_d[..., 2] > 0)
        b_idx = scene_d.bsdf_index_at(si)
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

        return dict(
            s,
            depth=new_depth, L=L_next, beta=beta, ray_o=new_o,
            ray_d=new_d, medium=new_medium, refr=new_refr, rng=rng,
            active=alive, prev_pdf=new_prev_pdf,
            prev_delta=new_prev_delta, prev_p=new_prev_p, grad=grad,
        )
