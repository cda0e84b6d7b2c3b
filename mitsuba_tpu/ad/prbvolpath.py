"""Volumetric path-replay backpropagation: prbvolpath / prb_unpolarized
(reference: src/python/python/ad/integrators/prbvolpath.py and
prb_unpolarized.py:11-422 — detached-sampling replay with per-event attached
terms; the transmittance-weight local-derivative trick dr.replace_grad(1, w)
at prb_polarized.py:202-205, attached phase at :270-277, attached NEE with
ratio-tracking transmittance gradients at :324-416).

Backward pass = a second ray-streaming scan replaying the primal's
counter-based RNG; per outer iteration one jax.vjp contracts the adjoint with
the iteration's attached local terms:

  w_seg   segment delta-tracking factor  -> dL . (w_att/w_det) . L_start
  Le      emitter-hit / escape radiance  -> dL . beta . mis . Le_att
  C_nee   NEE (phase_att * emitter_att * T_att(ratio tracking, attached
          sigma_n/detach(maj)))          -> dL . C_att (geometry detached)
  w_dir   phase/bsdf continuing weight   -> dL . (w_att/w_det) . L_next

Memory stays O(wavefront + params): vjp residuals live only inside the scan
iteration (the reference's O(wavefront) property, SURVEY.md §3.2)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..integrators.path import mis_weight, _next2
from ..integrators.volpath import (
    VolPathIntegrator,
    estimate_transmittance,
    sample_channel,
    track_segment,
)
from ..render.records import MediumInteraction, Ray, spawn_ray
from .prb import add_cotangent, zero_float_grads


@struct.dataclass
class PRBVolpathIntegrator(VolPathIntegrator):
    """Detached-sampling volumetric PRB (unpolarized variants; the polarized
    replay shares the primal and uses tape fallback for now)."""

    is_prb = True

    def sample_backward(self, scene, rng, ray, wavelengths, dL, L_primal, active):
        n = ray.o.shape[0]
        nc = scene.n_channels
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
            beta=jnp.ones((n, nc), jnp.float32),
            ray_o=ray.o,
            ray_d=ray.d,
            medium=jnp.full((n,), scene.camera_medium, jnp.int32),
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
        """One volumetric PRB replay step (scan body of sample_backward,
        shared with the regenerative backward driver).  `s['depth']` and
        `s['channel']` are per-lane; the regen driver threads per-sample
        `wavelengths`/`dL` through the state instead of the arguments."""
        channel = s["channel"]
        wavelengths = s.get("wavelengths", wavelengths)
        dL = s.get("dL", dL)
        rng_seg = s["rng"]                       # snapshot for replay
        cur_ray = Ray.make(s["ray_o"], s["ray_d"])
        si = scene_d.ray_intersect(cur_ray, s["active"])
        t_surf = jnp.where(si.is_valid, si.t, jnp.inf)

        # ---- detached segment tracking (identical to primal) ----
        reached_end, real, t_real, beta_f_det, rng = track_segment(
            scene_d, s["ray_o"], s["ray_d"], t_surf, s["medium"], channel,
            rng_seg, s["active"], self.track_steps,
        )
        seg_mask = s["active"] & (s["medium"] >= 0)
        beta = s["beta"] * jnp.where(s["active"][..., None], beta_f_det, 1.0)

        surface_event = s["active"] & reached_end & si.is_valid
        escaped = s["active"] & reached_end & ~si.is_valid

        p_med = s["ray_o"] + t_real[..., None] * s["ray_d"]
        mei = MediumInteraction.make(
            jnp.where(real, t_real, jnp.inf), p_med, s["ray_d"], s["medium"]
        )
        phase_idx = scene_d.medium_phase_of(s["medium"])

        u0, u2a_x, rng = _next2(rng)
        u2a_y, u_lobe, rng = _next2(rng)
        u2b_x, u2b_y, rng = _next2(rng)
        u_rr, _, rng = _next2(rng)

        # ---- detached contributions (mirror primal volpath) ----
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
        Le_det = (
            jnp.where(escaped[..., None], beta * w_env[..., None] * env_val_d, 0.0)
            + jnp.where(surface_event[..., None], beta * w_hit[..., None] * em_val_d, 0.0)
        )

        depth_ok = s["depth"] + 1 < max_depth
        is_null_surf = scene_d.is_null_bsdf(si)
        null_cross = surface_event & is_null_surf
        scatter_surf = surface_event & ~is_null_surf & depth_ok
        scatter_med = real & depth_ok

        nee_active = scatter_med | scatter_surf
        ref_p = jnp.where(scatter_med[..., None], p_med, si.p)
        ds, em_weight_d = scene_d.sample_emitter_direction(
            ref_p, u0, jnp.stack([u2a_x, u2a_y], axis=-1), wavelengths,
            nee_active, test_visibility=False,
        )
        nee_medium = jnp.where(
            scatter_surf, scene_d.medium_transition(si, ds.d, s["medium"]),
            s["medium"],
        )
        p_nee = jnp.where(
            scatter_surf[..., None],
            si.p + jnp.sign(jnp.sum(si.n * ds.d, axis=-1))[..., None] * 1e-4 * si.n,
            p_med,
        )
        rng_nee = rng                             # snapshot for replay
        T_nee_det, rng = estimate_transmittance(
            scene_d, p_nee, ds, nee_medium, channel, rng_nee, nee_active,
            max_crossings=self.nee_crossings, steps_per_segment=self.nee_steps,
        )

        wo_med = mei.to_local(ds.d)
        wo_surf = si.to_local(ds.d)
        ph_val_d, ph_pdf = scene_d.phase_eval_pdf(
            phase_idx, mei, wo_med, wavelengths, scatter_med
        )
        b_val_d, b_pdf = scene_d.bsdf_eval_pdf(si, wo_surf, wavelengths, scatter_surf)
        f_nee_d = jnp.where(scatter_med[..., None], ph_val_d, b_val_d)
        pdf_fwd = jnp.where(scatter_med, ph_pdf, b_pdf)
        w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_fwd))
        C_nee_det = jnp.where(
            nee_active[..., None],
            beta * f_nee_d * em_weight_d * T_nee_det * w_nee[..., None],
            0.0,
        )

        # detached direction sampling
        wo_ph, w_ph_det, pdf_ph = scene_d.phase_sample(
            phase_idx, mei, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1),
            wavelengths, scatter_med,
        )
        d_med = mei.to_world(wo_ph)
        bs, bw_det = scene_d.bsdf_sample(
            si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), wavelengths,
            scatter_surf,
        )
        d_surf = si.to_world(bs.wo)

        # emitter value ratio for attached NEE recompute
        em_val_plain_d = scene_d.eval_emitter_sample(ds, wavelengths)
        em_ratio = jnp.where(
            em_val_plain_d > 1e-20,
            em_weight_d / jnp.maximum(em_val_plain_d, 1e-20),
            0.0,
        )

        # remaining radiance bookkeeping (reference: L = L - Le - Lr_dir)
        L_start = s["L"]
        L_next = L_start - Le_det - C_nee_det

        inv_seg = jnp.where(
            beta_f_det > 1e-20, 1.0 / jnp.maximum(beta_f_det, 1e-20), 0.0
        )
        w_dir_det = jnp.where(scatter_med[..., None], w_ph_det, bw_det)
        inv_dir = jnp.where(
            w_dir_det > 1e-20, 1.0 / jnp.maximum(w_dir_det, 1e-20), 0.0
        )
        beta_det = beta

        def attached(sc):
            # 1. segment tracking weight (applies to all of L_start)
            _, _, _, bf_att, _ = track_segment(
                sc, s["ray_o"], s["ray_d"], t_surf, s["medium"], channel,
                rng_seg, s["active"], self.track_steps, detach_flight=True,
            )
            term_seg = jnp.where(
                seg_mask[..., None], dL * L_start * bf_att * inv_seg, 0.0
            )

            # 2. emission radiance attached
            env_a = sc.eval_environment(s["ray_d"], wavelengths)
            em_hit_a = sc.eval_emitter_hit(si, wavelengths)
            Le_a = (
                jnp.where(escaped[..., None], beta_det * w_env[..., None] * env_a, 0.0)
                + jnp.where(surface_event[..., None], beta_det * w_hit[..., None] * em_hit_a, 0.0)
            )
            term_le = dL * Le_a

            # 3. NEE: attached phase/bsdf value, emitter radiance, and
            # ratio-tracked transmittance (sigma_n attached)
            ph_a, _ = sc.phase_eval_pdf(phase_idx, mei, wo_med, wavelengths, scatter_med)
            b_a, _ = sc.bsdf_eval_pdf(si, wo_surf, wavelengths, scatter_surf)
            f_a = jnp.where(scatter_med[..., None], ph_a, b_a)
            em_a = sc.eval_emitter_sample(ds, wavelengths) * em_ratio
            T_a, _ = estimate_transmittance(
                sc, p_nee, ds, nee_medium, channel, rng_nee, nee_active,
                max_crossings=self.nee_crossings,
                steps_per_segment=self.nee_steps, detach_flight=True,
            )
            C_a = jnp.where(
                nee_active[..., None],
                beta_det * f_a * em_a * T_a * w_nee[..., None],
                0.0,
            )
            term_nee = dL * C_a

            # 4. continuing phase/bsdf weight on the suffix radiance:
            # attached f(wo_detached)/detach(pdf) — the sample() weight of
            # a perfectly importance-sampled lobe hides the parameter
            # dependence (e.g. HG weight == 1), so re-evaluate
            # (reference: prb.py:219-230 replace_grad(1, w) with attached
            # bsdf.eval at the sampled direction)
            ph_dir_a, _ = sc.phase_eval_pdf(
                phase_idx, mei, wo_ph, wavelengths, scatter_med
            )
            b_dir_a, _ = sc.bsdf_eval_pdf(si, bs.wo, wavelengths, scatter_surf)
            pdf_dir_det = jax.lax.stop_gradient(
                jnp.where(scatter_med, pdf_ph, bs.pdf)
            )
            f_dir_a = jnp.where(scatter_med[..., None], ph_dir_a, b_dir_a)
            w_dir_a = f_dir_a / jnp.maximum(pdf_dir_det, 1e-12)[..., None]
            # ratio (w_att / w_det) = f_att / f_det; primal value 1
            term_dir = jnp.where(
                (scatter_med | scatter_surf)[..., None],
                dL * jax.lax.stop_gradient(L_next) * w_dir_a * inv_dir,
                0.0,
            )
            return jnp.sum(term_seg + term_le + term_nee + term_dir)

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

        beta = jnp.where(scatter_med[..., None], beta * w_ph_det, beta)
        beta = jnp.where(scatter_surf[..., None], beta * bw_det, beta)

        new_medium = jnp.where(
            null_cross | scatter_surf,
            scene_d.medium_transition(si, new_d, s["medium"]),
            s["medium"],
        )
        new_depth = s["depth"] + (scatter_med | scatter_surf).astype(jnp.int32)
        new_prev_pdf = jnp.where(
            scatter_med, pdf_ph, jnp.where(scatter_surf, bs.pdf, s["prev_pdf"])
        )
        new_prev_delta = jnp.where(
            scatter_med, False, jnp.where(scatter_surf, bs.delta, s["prev_delta"])
        )
        new_prev_p = jnp.where(nee_active[..., None], ref_p, s["prev_p"])

        alive = s["active"] & ~escaped
        alive = alive & ~(scatter_surf & (bs.pdf <= 0))
        alive = alive & ~(scatter_med & (pdf_ph <= 0))
        alive = alive & ~(surface_event & ~is_null_surf & ~depth_ok)
        alive = alive & ~(real & ~depth_ok)
        alive = alive & (jnp.max(beta, axis=-1) > 0)

        beta_max = jnp.max(beta, axis=-1)
        rr_active = (new_depth >= self.rr_depth) & (scatter_med | scatter_surf)
        q = jnp.minimum(beta_max, 0.95)
        rr_continue = u_rr < q
        beta = jnp.where(
            (rr_active & alive)[..., None],
            beta / jnp.maximum(q, 1e-6)[..., None],
            beta,
        )
        alive = alive & (~rr_active | rr_continue)

        return dict(
            s,
            depth=new_depth, L=L_next, beta=beta, ray_o=new_o,
            ray_d=new_d, medium=new_medium, rng=rng, active=alive,
            prev_pdf=new_prev_pdf, prev_delta=new_prev_delta,
            prev_p=new_prev_p, grad=grad,
        )

    def regen_backward(self, scene, seed, spp, sensor_idx, dL_px, L_samples):
        return volumetric_regen_backward(
            self, scene, seed, spp, sensor_idx, dL_px, L_samples
        )


def volumetric_regen_backward(integrator, scene, seed, spp, sensor_idx,
                              dL_px, L_samples):
    """Regenerative volumetric PRB replay: backward twin of
    volpath_regen_render.  Lanes restart on their pixel's next sample with L
    reset to that sample's recorded primal radiance.  The per-pixel film
    adjoint dL_px is pulled back through the flush conversion into each
    regenerated sample's integrator domain:

      rgb/mono    identity (flush is a plain sum)
      polarized   R(cam_d)^T over the Stokes index (to_sensor_mueller is an
                  orthogonal per-lane rotation)
      spectral    vjp of the XYZ->sRGB(+clip) conversion at the sample's
                  recorded primal radiance and regenerated hero wavelengths

    `integrator._regen_extra` state (e.g. volpathaos refractive memory) is
    reset on restart exactly like the primal driver."""
    from ..render_api import wavefront_for
    from ..integrators.path import lanes_rng, merge_rng
    from ..render.spectrum_ops import get_ops

    film = scene.film
    n = film.crop_w * film.crop_h
    nc = scene.n_channels
    ops = get_ops(scene.polarized)
    spectral = nc == 4 and not scene.polarized
    max_depth = integrator.max_depth if integrator.max_depth > 0 else 64
    max_segments = integrator.max_segments or (max_depth + 8)
    pix = jnp.arange(n, dtype=jnp.uint32)
    scene_d = jax.lax.stop_gradient(scene)
    dL_px = jax.lax.stop_gradient(dL_px)
    L_samples = jax.lax.stop_gradient(L_samples)
    extra0 = integrator._regen_extra(n, scene)

    def fresh(sidx):
        # identical draw order to volpath_regen_render.fresh
        rng_f, ray_f, wl_f, wlp_f, _ = wavefront_for(
            scene_d, seed, pix, sidx, jnp.uint32(spp), sensor_idx
        )
        rng_f = lanes_rng(rng_f, n)
        u_ch, _, rng_f = _next2(rng_f)
        return rng_f, ray_f, sample_channel(u_ch, nc), wl_f, wlp_f

    def lane_dL(L_s, wl, wlp, cam_d):
        """Pull dL_px back through the flush conversion for a fresh sample."""
        if scene.polarized:
            from ..render_api import sensor_stokes_rotation

            R = sensor_stokes_rotation(cam_d)
            return jnp.einsum("nji,ncj->nci", R, dL_px)
        if spectral:
            from ..core import spectrum as spec

            if film.srfs:
                def f(Lv):
                    uv0 = jnp.zeros((Lv.shape[0], 2), jnp.float32)
                    inv_pdf = 1.0 / jnp.maximum(wlp, 1e-12)
                    return jnp.stack(
                        [
                            jnp.mean(srf.eval(uv0, wl, 4) * Lv * inv_pdf, -1)
                            / norm
                            for srf, norm in zip(film.srfs, film.srf_norms)
                        ],
                        axis=-1,
                    )
            else:
                def f(Lv):
                    xyz = spec.spectrum_to_xyz(Lv, wl, wlp)
                    return jnp.clip(spec.xyz_to_srgb(xyz), 0.0, None)

            _, f_vjp = jax.vjp(f, L_s)
            return f_vjp(dL_px)[0]
        return dL_px

    rng0, ray0, ch0, wl0, wlp0 = fresh(jnp.zeros((n,), jnp.uint32))

    state = dict(
        iters=jnp.asarray(0, jnp.int32),
        s_next=jnp.zeros((n,), jnp.uint32),
        depth=jnp.zeros((n,), jnp.int32),
        L=jnp.zeros_like(L_samples[:, 0]),
        beta=ops.one(n, nc),
        dL=jnp.zeros_like(L_samples[:, 0]),
        ray_o=ray0.o,
        ray_d=ray0.d,
        medium=jnp.full((n,), scene.camera_medium, jnp.int32),
        channel=ch0,
        rng=rng0,
        active=jnp.zeros((n,), bool),
        prev_pdf=jnp.ones((n,), jnp.float32),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray0.o,
        grad=zero_float_grads(scene),
        **extra0,
    )
    if nc == 4:
        # hero wavelengths ride the state in every spectral mode (incl.
        # polarized), exactly like volpath_regen_render
        state["wavelengths"] = wl0
        state["wl_pdf"] = wlp0

    def cond(s):
        work = s["active"] | (s["s_next"] < jnp.uint32(spp))
        return jnp.any(work) & (s["iters"] < spp * max_segments + 1)

    def body(s):
        regen = (~s["active"]) & (s["s_next"] < jnp.uint32(spp))
        rng_new, ray_new, ch_new, wl_new, wlp_new = fresh(s["s_next"])

        def sel(a, b):
            m = regen
            while m.ndim < a.ndim:
                m = m[..., None]
            return jnp.where(m, a, b)

        s_idx = jnp.minimum(s["s_next"], jnp.uint32(spp - 1))
        L_fresh = L_samples[jnp.arange(n), s_idx]
        upd = dict(
            L=sel(L_fresh, s["L"]),
            beta=sel(ops.one(n, nc), s["beta"]),
            dL=sel(lane_dL(L_fresh, wl_new, wlp_new, ray_new.d), s["dL"]),
            ray_o=sel(ray_new.o, s["ray_o"]),
            ray_d=sel(ray_new.d, s["ray_d"]),
            medium=sel(jnp.full((n,), scene.camera_medium, jnp.int32), s["medium"]),
            channel=sel(ch_new, s["channel"]),
            rng=merge_rng(rng_new, s["rng"], regen),
            depth=sel(jnp.zeros_like(s["depth"]), s["depth"]),
            prev_pdf=sel(jnp.ones_like(s["prev_pdf"]), s["prev_pdf"]),
            prev_delta=sel(jnp.ones_like(s["prev_delta"]), s["prev_delta"]),
            prev_p=sel(ray_new.o, s["prev_p"]),
            active=s["active"] | regen,
            s_next=jnp.where(regen, s["s_next"] + 1, s["s_next"]),
            **{k: sel(v, s[k]) for k, v in extra0.items()},
        )
        if nc == 4:
            upd["wavelengths"] = sel(wl_new, s["wavelengths"])
            upd["wl_pdf"] = sel(wlp_new, s["wl_pdf"])
        s = dict(s, **upd)
        s = integrator._bwd_bounce(scene_d, scene, None, None, max_depth, s)
        return dict(s, iters=s["iters"] + 1)

    out = jax.lax.while_loop(cond, body, state)
    return out["grad"]

