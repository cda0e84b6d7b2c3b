"""Polarized volumetric path-replay backpropagation: prb_polarized /
prb_volpathaos (reference: src/python/python/ad/integrators/prb_polarized.py
:11-422 and prb_volpathaos.py:11-509 — Mueller-throughput replay with
per-event attached terms).

Structure follows the scalar volumetric replay (prbvolpath.py) with Mueller
algebra:

  * throughput beta is a [N, C, 4, 4] Mueller chain (beta' = beta @ M, like
    the reference's `throughput @ phase_weight`, prb_polarized.py:279).
  * the remaining-radiance accumulator keeps the FULL Stokes vector between
    iterations: scalar tracking/RR weights are polarization-preserving, so
    their attached ratios act exactly on every Stokes component.  Only the
    Mueller direction-weight suffix term reduces to the intensity component
    ([I, 0, 0, 0] is basis-rotation invariant, which keeps the replay trick
    well-defined there).  The reference instead zeroes Q/U/V at every loop
    top (prb_polarized.py:140-141), losing all polarized adjoint information
    in the scalar terms — e.g. dQ/d(albedo) comes out 0 there but matches
    finite differences here (tests/test_prb_polarized.py).
  * per outer iteration, one jax.vjp contracts the film adjoint dL (a Stokes
    vector per lane, already rotated back from the sensor frame by
    render_ad._prb_pass_bwd) with the iteration's attached local terms:

      w_seg   scalar delta-tracking ratios  -> dL . L_I . (w_att / w_det)
      Le      emission (unpolarized source) -> dL . (beta_det first-column
              Stokes of the attached radiance)
      C_nee   attached Mueller phase/bsdf value (basis-rotated exactly as the
              primal's eval_pdf_pol does) x attached emitter radiance x
              attached ratio-tracked transmittance, through detached beta
      w_dir   attached Mueller eval at the sampled direction over the
              detached sampling pdf, applied to the intensity of the
              remaining suffix radiance (reference's replace_grad(1, eval)
              @ detach(L), prb_polarized.py:272-277 / :292-299)

Gradient scope matches the reference: medium parameters (sigma_t, albedo,
grids), phase parameters (g, tabulated polarized phases), emitter radiance,
surface reflectance.  Not supported (same as reference): shape parameters
(no reparameterization), perfectly specular parameters (detached sampling).
"""
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
from ..render.spectrum_ops import MuellerOps as ops
from .prb import add_cotangent, zero_float_grads


@struct.dataclass
class PRBPolarizedVolpathIntegrator(VolPathIntegrator):
    """Detached-sampling polarized volumetric PRB (mono_polarized /
    spectral_polarized variants).  The primal is the shared polarized volpath
    (VolPathIntegrator.sample with MuellerOps)."""

    is_prb = True
    # debugging aid: which attached terms contribute (comma-separated)
    terms: str = struct.field(pytree_node=False, default="seg,le,nee,dir")

    def sample_backward(self, scene, rng, ray, wavelengths, dL, L_primal, active):
        n = ray.o.shape[0]
        nc = scene.n_channels
        scene_d = jax.lax.stop_gradient(scene)
        dL = jax.lax.stop_gradient(dL)                    # [N, C, 4]
        max_depth = self.max_depth if self.max_depth > 0 else 64
        max_segments = self.max_segments or (max_depth + 8)

        u_ch, _, rng = _next2(rng)
        channel = sample_channel(u_ch, nc)

        grad0 = zero_float_grads(scene)

        state = dict(
            depth=jnp.zeros((n,), jnp.int32),
            L=jax.lax.stop_gradient(L_primal),            # [N, C, 4]
            beta=ops.one(n, nc),                          # [N, C, 4, 4]
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

    def regen_backward(self, scene, seed, spp, sensor_idx, dL_px, L_samples):
        from .prbvolpath import volumetric_regen_backward

        return volumetric_regen_backward(
            self, scene, seed, spp, sensor_idx, dL_px, L_samples
        )

    def _bwd_bounce(self, scene_d, scene, wavelengths, dL, max_depth, s):
        """One polarized PRB replay step (scan body of sample_backward,
        shared with the regenerative backward driver).  `s['depth']` and
        `s['channel']` are per-lane; the regen driver threads per-sample
        `wavelengths`/`dL` through the state."""
        n = s["ray_o"].shape[0]
        nc = scene.n_channels
        channel = s["channel"]
        wavelengths = s.get("wavelengths", wavelengths)
        dL = s.get("dL", dL)
        rng_seg = s["rng"]                            # snapshot for replay
        cur_ray = Ray.make(s["ray_o"], s["ray_d"])
        si = scene_d.ray_intersect(cur_ray, s["active"])
        t_surf = jnp.where(si.is_valid, si.t, jnp.inf)

        # full-Stokes remaining radiance: scalar (polarization-preserving)
        # weights act identically on every Stokes component, so the
        # consumption bookkeeping is exact for them; only the Mueller
        # direction-weight suffix (term 4) needs the intensity-only
        # approximation.  (Improves on the reference, which zeroes Q/U/V
        # at every loop top, prb_polarized.py:140-141, losing e.g.
        # dQ/d(albedo) entirely.)
        L_start = s["L"]

        # ---- detached segment tracking (identical to primal) ----
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
            ops.where_rad(
                escaped, ops.emit(beta, env_val_d * w_env[..., None]),
                jnp.zeros((n, nc, 4), jnp.float32),
            )
            + ops.where_rad(
                surface_event, ops.emit(beta, em_val_d * w_hit[..., None]),
                jnp.zeros((n, nc, 4), jnp.float32),
            )
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
        rng_nee = rng                                 # snapshot for replay
        T_nee_det, rng = estimate_transmittance(
            scene_d, p_nee, ds, nee_medium, channel, rng_nee, nee_active,
            max_crossings=self.nee_crossings, steps_per_segment=self.nee_steps,
        )

        wo_med = mei.to_local(ds.d)
        wo_surf = si.to_local(ds.d)
        ph_val_d, ph_pdf = scene_d.phase_eval_pdf_pol(
            phase_idx, mei, wo_med, wavelengths, scatter_med
        )
        b_val_d, b_pdf = scene_d.bsdf_eval_pdf_pol(
            si, wo_surf, wavelengths, scatter_surf
        )
        f_nee_d = jnp.where(scatter_med[..., None, None, None], ph_val_d, b_val_d)
        pdf_fwd = jnp.where(scatter_med, ph_pdf, b_pdf)
        w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_fwd))
        C_nee_det = ops.where_rad(
            nee_active,
            ops.contrib_nee(
                beta, f_nee_d, em_weight_d * T_nee_det * w_nee[..., None]
            ),
            jnp.zeros((n, nc, 4), jnp.float32),
        )

        # detached direction sampling (Mueller weights)
        wo_ph, w_ph_det, pdf_ph = scene_d.phase_sample_pol(
            phase_idx, mei, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1),
            wavelengths, scatter_med,
        )
        d_med = mei.to_world(wo_ph)
        bs, bw_det = scene_d.bsdf_sample_pol(
            si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), wavelengths,
            scatter_surf,
        )
        d_surf = si.to_world(bs.wo)

        em_val_plain_d = scene_d.eval_emitter_sample(ds, wavelengths)
        em_ratio = jnp.where(
            em_val_plain_d > 1e-20,
            em_weight_d / jnp.maximum(em_val_plain_d, 1e-20),
            0.0,
        )

        # remaining radiance (L <- L - Le - Lr_nee; intensity suffix)
        L_next = L_start - Le_det - C_nee_det

        inv_seg = jnp.where(
            beta_f_det > 1e-20, 1.0 / jnp.maximum(beta_f_det, 1e-20), 0.0
        )
        w_dir_det = jnp.where(
            scatter_med[..., None, None, None], w_ph_det, bw_det
        )                                              # [N, C, 4, 4]
        # per-event intensity of the detached direction weight: the suffix
        # ratio must be per-event O(1) — dividing by the full-chain
        # intensity (beta @ w)[0,0] amplifies the remaining-L bookkeeping
        # noise by 1/beta and explodes for long low-throughput chains
        w_dir_int = w_dir_det[..., 0, 0]               # [N, C]
        inv_dir = jnp.where(
            w_dir_int > 1e-12, 1.0 / jnp.maximum(w_dir_int, 1e-12), 0.0
        )
        beta_det = beta

        def attached(sc):
            # 1. segment tracking weight (scalar ratios on the remaining
            # intensity; polarization-preserving)
            _, _, _, bf_att, _ = track_segment(
                sc, s["ray_o"], s["ray_d"], t_surf, s["medium"], channel,
                rng_seg, s["active"], self.track_steps, detach_flight=True,
            )
            ratio_seg = (bf_att * inv_seg)[..., None]   # [N, C, 1]
            term_seg = jnp.where(
                seg_mask[..., None, None], dL * L_start * ratio_seg, 0.0
            )

            # 2. attached emission through the detached Mueller chain
            env_a = sc.eval_environment(s["ray_d"], wavelengths)
            em_hit_a = sc.eval_emitter_hit(si, wavelengths)
            Le_a = (
                ops.where_rad(
                    escaped, ops.emit(beta_det, env_a * w_env[..., None]),
                    jnp.zeros((n, nc, 4), jnp.float32),
                )
                + ops.where_rad(
                    surface_event,
                    ops.emit(beta_det, em_hit_a * w_hit[..., None]),
                    jnp.zeros((n, nc, 4), jnp.float32),
                )
            )
            term_le = dL * Le_a

            # 3. NEE: attached Mueller phase/bsdf value (with the primal's
            # basis rotations), attached emitter radiance, attached
            # ratio-tracked transmittance
            ph_a, _ = sc.phase_eval_pdf_pol(
                phase_idx, mei, wo_med, wavelengths, scatter_med
            )
            b_a, _ = sc.bsdf_eval_pdf_pol(si, wo_surf, wavelengths, scatter_surf)
            f_a = jnp.where(scatter_med[..., None, None, None], ph_a, b_a)
            em_a = sc.eval_emitter_sample(ds, wavelengths) * em_ratio
            T_a, _ = estimate_transmittance(
                sc, p_nee, ds, nee_medium, channel, rng_nee, nee_active,
                max_crossings=self.nee_crossings,
                steps_per_segment=self.nee_steps, detach_flight=True,
            )
            C_a = ops.where_rad(
                nee_active,
                ops.contrib_nee(
                    beta_det, f_a, em_a * T_a * w_nee[..., None]
                ),
                jnp.zeros((n, nc, 4), jnp.float32),
            )
            term_nee = dL * C_a

            # 4. continuing weight on the suffix intensity: attached
            # Mueller eval at the detached sampled direction over the
            # detached pdf (reference: replace_grad(1, phase_eval) @
            # detach(L), prb_polarized.py:272-277)
            ph_dir_a, _ = sc.phase_eval_pdf_pol(
                phase_idx, mei, wo_ph, wavelengths, scatter_med
            )
            b_dir_a, _ = sc.bsdf_eval_pdf_pol(si, bs.wo, wavelengths, scatter_surf)
            pdf_dir_det = jax.lax.stop_gradient(
                jnp.where(scatter_med, pdf_ph, bs.pdf)
            )
            f_dir_a = jnp.where(
                scatter_med[..., None, None, None], ph_dir_a, b_dir_a
            )
            w_att_I = (
                f_dir_a[..., 0, 0]
                / jnp.maximum(pdf_dir_det, 1e-12)[..., None]
            )
            # per-event intensity ratio (primal value 1) applied to the
            # full remaining Stokes: exact for intensity-scaling phase
            # parameters (HG g, albedo-like), approximate for parameters
            # that reshape the polarized structure of a Mueller phase
            # (the suffix's polarization response is not replayable
            # without inverting the chain; the reference's intensity-only
            # L has the same limitation, prb_polarized.py:272-277)
            ratio_dir = w_att_I * inv_dir
            term_dir = jnp.where(
                (scatter_med | scatter_surf)[..., None, None],
                dL * jax.lax.stop_gradient(L_next) * ratio_dir[..., None],
                0.0,
            )
            enabled = self.terms.split(",")
            total = 0.0
            for name, term in (
                ("seg", term_seg), ("le", term_le),
                ("nee", term_nee), ("dir", term_dir),
            ):
                if name in enabled:
                    total = total + jnp.sum(term)
            return total

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
        beta_int = ops.intensity_beta(beta)
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
            ray_d=new_d, medium=new_medium, rng=rng, active=alive,
            prev_pdf=new_prev_pdf, prev_delta=new_prev_delta,
            prev_p=new_prev_p, grad=grad,
        )
