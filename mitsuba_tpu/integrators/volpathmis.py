"""Volumetric path tracer with *spectral* null-scattering path-integral MIS
(reference: src/integrators/volpathmis.cpp, Miller et al. 2019).

Instead of a throughput spectrum, each lane carries two [C, C] weight
matrices P[i, j] = prod over path events of pdf_j / f_i, where j indexes the
C distance-sampling strategies (hero channel used for real/null decisions)
and i the contribution channel (reference: WeightMatrix + update_weights,
volpathmis.cpp:508-530).  Contributions are combined with the balance
heuristic over strategies: weight[i] = C / sum_j P[i, j] (one-sample MIS,
mis_weight, volpathmis.cpp:532-566); emitter-hit vs NEE combine as
C / sum_j (P1 + P2).

Our media use a single shared majorant (max over channels, matching
heterogeneous.cpp:163's constant majorant), so the free-flight pdf/tr
factors of a tracking step cancel entrywise and each event contributes a
closed-form factor matrix:
    null  collision:  P_uni *= sigma_n[j] / sigma_n[i],  P_nee *= maj / sigma_n[i]
    real  collision:  P_uni *= sigma_t[j] / sigma_s[i]
    phase/BSDF:       P_uni *= pdf / (w[i] pdf),         P_nee *= 1 / (w[i] pdf)
(reference: volpathmis.cpp:246-306 event updates).  Polarized variants are
rejected, as in the reference (volpathmis.cpp:133-135).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..render.records import MediumInteraction, Ray, spawn_ray
from .path import mis_weight, _next2
from .volpath import sample_channel, index_spectrum


def _upd(P, p, f, mask):
    """P[i, j] *= p[j] / f[i] on masked lanes; non-finite ratios -> 0
    (reference: update_weights, volpathmis.cpp:508-530)."""
    ratio = p[:, None, :] / f[:, :, None]
    ratio = jnp.where(jnp.isfinite(ratio), ratio, 0.0)
    Pn = P * ratio
    Pn = jnp.where(jnp.isnan(Pn), 0.0, Pn)
    return jnp.where(mask[:, None, None], Pn, P)


def _upd_scalar(P, p_scalar, mask):
    """P *= p (pdf-only event, f = 1)."""
    return jnp.where(mask[:, None, None], P * p_scalar[:, None, None], P)


def _mis1(P):
    """[N, C] contribution weight C / sum_j P[i, j]."""
    s = jnp.sum(P, axis=-1)
    C = P.shape[-1]
    return jnp.where(s > 0, C / jnp.where(s > 0, s, 1.0), 0.0)


def _mis2(P1, P2):
    s = jnp.sum(P1 + P2, axis=-1)
    C = P1.shape[-1]
    return jnp.where(s > 0, C / jnp.where(s > 0, s, 1.0), 0.0)


def _safe_div_outer(num, den):
    """num[j]/den[i] -> [N, C, C] with non-finite -> 0."""
    r = num[:, None, :] / den[:, :, None]
    return jnp.where(jnp.isfinite(r), r, 0.0)


def track_segment_mis(scene, p0, d, seg_len, medium, channel, rng, active, n_steps):
    """Delta-track one segment, accumulating the uni/NEE factor matrices
    (analog of volpath.track_segment with spectral-MIS bookkeeping)."""
    n = p0.shape[0]
    nc = scene.n_channels
    in_medium = active & (medium >= 0)
    maj = jnp.maximum(scene.medium_majorant(medium, p0), 1e-8)
    eye = jnp.ones((n, nc, nc), jnp.float32)

    state = dict(
        t=jnp.zeros((n,), jnp.float32),
        fac_u=eye,
        fac_n=eye,
        pending=in_medium,
        is_real=jnp.zeros((n,), bool),
        t_real=jnp.zeros((n,), jnp.float32),
        rng=rng,
    )

    def body(s, _):
        rng = s["rng"]
        u_flight, u_event, rng = _next2(rng)
        dt = -jnp.log(jnp.maximum(1.0 - u_flight, 1e-20)) / maj
        t_new = s["t"] + dt
        passed = t_new >= seg_len
        collide = s["pending"] & ~passed

        p = p0 + t_new[..., None] * d
        ss, sn, st = scene.medium_coefficients(medium, p, d)
        prob_real = jnp.clip(index_spectrum(st, channel) / maj, 0.0, 1.0)
        real = collide & (u_event < prob_real)
        null = collide & ~real

        fac_u = _upd_mat(s["fac_u"], _safe_div_outer(sn, sn), null)
        fac_n = _upd_mat(
            s["fac_n"],
            jnp.where(
                jnp.isfinite(maj[:, None, None] / sn[:, :, None]),
                maj[:, None, None] / sn[:, :, None],
                0.0,
            ),
            null,
        )
        fac_u = _upd_mat(fac_u, _safe_div_outer(st, ss), real)

        return (
            dict(
                t=jnp.where(collide, t_new, s["t"]),
                fac_u=fac_u,
                fac_n=fac_n,
                pending=s["pending"] & null,
                is_real=s["is_real"] | real,
                t_real=jnp.where(real, t_new, s["t_real"]),
                rng=rng,
            ),
            None,
        )

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    # unresolved lanes -> absorbed (matrix -> 0 kills the contribution)
    dead = out["pending"][:, None, None]
    fac_u = jnp.where(dead, 0.0, out["fac_u"])
    fac_n = jnp.where(dead, 0.0, out["fac_n"])
    reached_end = ~out["is_real"] & ~out["pending"]
    reached_end = jnp.where(in_medium, reached_end, active)
    fac_u = jnp.where(in_medium[:, None, None], fac_u, eye)
    fac_n = jnp.where(in_medium[:, None, None], fac_n, eye)
    return reached_end, out["is_real"] & in_medium, out["t_real"], fac_u, fac_n, out["rng"]


def _upd_mat(P, fac, mask):
    return jnp.where(mask[:, None, None], P * fac, P)


def nee_transmittance_mis(scene, p0, ds, medium_idx0, channel, rng, active,
                          max_crossings=4, steps_per_segment=32):
    """Ratio-tracking transmittance factor matrices for the NEE connection
    (reference: sample_emitter inner loop, volpathmis.cpp:381-505)."""
    n = p0.shape[0]
    nc = scene.n_channels
    d = ds.d
    eye = jnp.ones((n, nc, nc), jnp.float32)

    state = dict(
        p=p0,
        remaining=ds.dist * (1.0 - 1e-3),
        medium=medium_idx0,
        fac_n=eye,
        fac_u=eye,
        alive=active & (ds.pdf > 0),
        blocked=jnp.zeros((n,), bool),
        rng=rng,
    )

    for _ in range(max_crossings):
        ray = spawn_ray(state["p"], d, d, maxt=state["remaining"])
        si = scene.ray_intersect(ray, state["alive"])
        t_surf = jnp.where(si.is_valid, si.t, jnp.inf)
        seg_len = jnp.minimum(t_surf, state["remaining"])

        maj = jnp.maximum(scene.medium_majorant(state["medium"], ray.o), 1e-8)
        in_med = state["alive"] & (state["medium"] >= 0)

        def body(s, _):
            rng_i = s["rng"]
            u_flight, _, rng_i = _next2(rng_i)
            dt = -jnp.log(jnp.maximum(1.0 - u_flight, 1e-20)) / maj
            t_new = s["t"] + dt
            collide = s["pending"] & (t_new < seg_len)
            p = ray.o + t_new[..., None] * d
            _, sn, _ = scene.medium_coefficients(state["medium"], p, d)
            fac_n = _upd_mat(
                s["fac_n"],
                jnp.where(
                    jnp.isfinite(maj[:, None, None] / sn[:, :, None]),
                    maj[:, None, None] / sn[:, :, None],
                    0.0,
                ),
                collide,
            )
            fac_u = _upd_mat(s["fac_u"], _safe_div_outer(sn, sn), collide)
            return (
                dict(t=jnp.where(collide, t_new, s["t"]), fac_n=fac_n,
                     fac_u=fac_u, pending=collide, rng=rng_i),
                None,
            )

        seg0 = dict(
            t=jnp.zeros((n,), jnp.float32), fac_n=eye, fac_u=eye,
            pending=in_med, rng=state["rng"],
        )
        seg, _ = jax.lax.scan(body, seg0, None, length=steps_per_segment)
        # unresolved -> treat as blocked
        unresolved = seg["pending"]
        fac_n = state["fac_n"] * jnp.where(in_med[:, None, None], seg["fac_n"], 1.0)
        fac_u = state["fac_u"] * jnp.where(in_med[:, None, None], seg["fac_u"], 1.0)

        hit_surface = state["alive"] & si.is_valid & (t_surf < state["remaining"])
        is_null = scene.is_null_bsdf(si)
        blocked = state["blocked"] | (hit_surface & ~is_null) | unresolved
        cross = hit_surface & is_null

        new_medium = jnp.where(
            cross, scene.medium_transition(si, d, state["medium"]), state["medium"]
        )
        adv = jnp.where(cross, t_surf, 0.0)
        state = dict(
            p=state["p"] + (adv + 1e-4)[..., None] * d,
            remaining=state["remaining"] - adv,
            medium=new_medium,
            fac_n=fac_n,
            fac_u=fac_u,
            alive=cross & ~blocked,
            blocked=blocked,
            rng=seg["rng"],
        )

    blocked = state["blocked"] | state["alive"]  # crossings beyond budget
    dead = (blocked | ~active)[:, None, None]
    return (
        jnp.where(dead, 0.0, state["fac_n"]),
        jnp.where(dead, 0.0, state["fac_u"]),
        state["rng"],
    )


@struct.dataclass
class VolPathMisIntegrator:
    """Spectral-MIS volumetric path tracer (plugin name `volpathmis`)."""

    max_depth: int = struct.field(pytree_node=False, default=8)
    rr_depth: int = struct.field(pytree_node=False, default=5)
    hide_emitters: bool = struct.field(pytree_node=False, default=False)
    max_segments: int = struct.field(pytree_node=False, default=0)
    track_steps: int = struct.field(pytree_node=False, default=32)
    nee_crossings: int = struct.field(pytree_node=False, default=4)
    nee_steps: int = struct.field(pytree_node=False, default=32)

    def sample(self, scene, rng, ray, wavelengths, active):
        if scene.polarized:
            raise ValueError(
                "volpathmis does not support polarized mode "
                "(reference: volpathmis.cpp:133-135)"
            )
        n = ray.o.shape[0]
        nc = scene.n_channels
        max_depth = self.max_depth if self.max_depth > 0 else 64
        max_segments = self.max_segments or (max_depth + 8)
        eye = jnp.ones((n, nc, nc), jnp.float32)

        u_ch, _, rng = _next2(rng)
        channel = sample_channel(u_ch, nc)

        state = dict(
            depth=jnp.zeros((n,), jnp.int32),
            n_rays=jnp.asarray(0.0, jnp.float32),
            L=jnp.zeros((n, nc), jnp.float32),
            P=eye,          # p_over_f
            Pn=eye,         # p_over_f_nee
            ray_o=ray.o,
            ray_d=ray.d,
            medium=jnp.full((n,), scene.camera_medium, jnp.int32),
            rng=rng,
            active=active,
            prev_delta=jnp.ones((n,), bool),
            prev_p=ray.o,
        )

        def body(s, _):
            rng = s["rng"]
            cur_ray = Ray.make(s["ray_o"], s["ray_d"])
            si = scene.ray_intersect(cur_ray, s["active"])
            t_surf = jnp.where(si.is_valid, si.t, jnp.inf)

            reached_end, real, t_real, fac_u, fac_n, rng = track_segment_mis(
                scene, s["ray_o"], s["ray_d"], t_surf, s["medium"], channel,
                rng, s["active"], self.track_steps,
            )
            act3 = s["active"][:, None, None]
            P = jnp.where(act3, s["P"] * fac_u, s["P"])
            Pn = jnp.where(act3, s["Pn"] * fac_n, s["Pn"])
            # a real collision resets the NEE matrix to the uni matrix
            # (reference: volpathmis.cpp:289 "In a real interaction")
            # -- done below after the real-event factor is folded in.

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
            u_rr, _, rng = _next2(rng)

            # ---- emitter hit / escape: MIS vs the NEE strategy ----
            L = s["L"]
            env_val = scene.eval_environment(s["ray_d"], wavelengths)
            env_pdf = scene.pdf_emitter_direction_escaped(s["ray_d"])
            Pn_env = _upd_scalar(Pn, env_pdf, escaped & ~s["prev_delta"])
            w_env = jnp.where(
                s["prev_delta"][:, None], _mis1(P), _mis2(P, Pn_env)
            )
            L = L + jnp.where(escaped[:, None], w_env * env_val, 0.0)

            em_val = scene.eval_emitter_hit(si, wavelengths)
            em_pdf = scene.pdf_emitter_direction_hit(s["prev_p"], si)
            Pn_hit = _upd_scalar(Pn, em_pdf, surface_event & ~s["prev_delta"])
            w_hit = jnp.where(
                s["prev_delta"][:, None], _mis1(P), _mis2(P, Pn_hit)
            )
            L = L + jnp.where(surface_event[:, None], w_hit * em_val, 0.0)

            depth_ok = s["depth"] + 1 < max_depth
            is_null_surf = scene.is_null_bsdf(si)
            null_cross = surface_event & is_null_surf
            scatter_surf = surface_event & ~is_null_surf & depth_ok
            scatter_med = real & depth_ok

            # NEE matrix reset at real scatter events (medium scatter only;
            # the surface reset happens at the BSDF-sample update below)
            Pn = jnp.where(real[:, None, None], P, Pn)

            # ---- NEE with matrix branches ----
            nee_active = scatter_med | scatter_surf
            ref_p = jnp.where(scatter_med[..., None], p_med, si.p)
            ds, em_weight = scene.sample_emitter_direction(
                ref_p, u0, jnp.stack([u2a_x, u2a_y], axis=-1), wavelengths,
                nee_active, test_visibility=False,
            )
            emitter_val = em_weight * ds.pdf[..., None]
            nee_medium = jnp.where(
                scatter_surf, scene.medium_transition(si, ds.d, s["medium"]),
                s["medium"],
            )
            p_nee = jnp.where(
                scatter_surf[..., None],
                si.p + jnp.sign(jnp.sum(si.n * ds.d, axis=-1))[..., None] * 1e-4 * si.n,
                p_med,
            )
            Pn_end = _upd_scalar(P, ds.pdf, nee_active)
            P_end = P
            T_n, T_u, rng = nee_transmittance_mis(
                scene, p_nee, ds, nee_medium, channel, rng, nee_active,
                max_crossings=self.nee_crossings,
                steps_per_segment=self.nee_steps,
            )
            Pn_end = Pn_end * jnp.where(nee_active[:, None, None], T_n, 1.0)
            P_end = P_end * jnp.where(nee_active[:, None, None], T_u, 1.0)

            wo_med = mei.to_local(ds.d)
            wo_surf = si.to_local(ds.d)
            ph_val, ph_pdf = scene.phase_eval_pdf(
                phase_idx, mei, wo_med, wavelengths, scatter_med
            )
            b_val, b_pdf = scene.bsdf_eval_pdf(si, wo_surf, wavelengths, scatter_surf)
            f_nee = jnp.where(scatter_med[..., None], ph_val, b_val)
            pdf_fwd = jnp.where(scatter_med, ph_pdf, b_pdf)
            ones = jnp.ones((n, nc), jnp.float32)
            Pn_end = _upd(Pn_end, ones, f_nee, nee_active)
            P_end = _upd(
                P_end, jnp.where(ds.delta, 0.0, pdf_fwd)[:, None] * ones,
                f_nee, nee_active,
            )
            w_nee = _mis2(Pn_end, P_end)
            L = L + jnp.where(nee_active[:, None], w_nee * emitter_val, 0.0)

            # ---- direction sampling ----
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
            o_surf = spawn_ray(si.p, si.n, new_d).o
            new_o = jnp.where(
                scatter_med[..., None], p_med,
                jnp.where(surface_event[..., None], o_surf, s["ray_o"]),
            )

            # phase event: P *= pdf/(w*pdf), Pn *= 1/(w*pdf)
            f_ph = w_ph * jnp.maximum(pdf_ph, 1e-20)[:, None]
            P = _upd(P, pdf_ph[:, None] * ones, f_ph, scatter_med)
            Pn = _upd(Pn, ones, f_ph, scatter_med)
            # surface event: NEE matrix resets to P first (non-null BSDFs)
            Pn = jnp.where(scatter_surf[:, None, None], P, Pn)
            f_b = bw * jnp.maximum(bs.pdf, 1e-20)[:, None]
            P = _upd(P, bs.pdf[:, None] * ones, f_b, scatter_surf)
            Pn = _upd(Pn, ones, f_b, scatter_surf)

            new_medium = jnp.where(
                null_cross | scatter_surf,
                scene.medium_transition(si, new_d, s["medium"]),
                s["medium"],
            )

            new_depth = s["depth"] + (scatter_med | scatter_surf).astype(jnp.int32)
            new_prev_delta = jnp.where(
                scatter_med, False, jnp.where(scatter_surf, bs.delta, s["prev_delta"])
            )
            new_prev_p = jnp.where(nee_active[..., None], ref_p, s["prev_p"])

            alive = s["active"] & ~escaped
            alive = alive & ~(scatter_surf & (bs.pdf <= 0))
            alive = alive & ~(scatter_med & (pdf_ph <= 0))
            alive = alive & ~(surface_event & ~is_null_surf & ~depth_ok)
            alive = alive & ~(real & ~depth_ok)
            thr = _mis1(P)
            alive = alive & (jnp.max(thr, axis=-1) > 0)

            # ---- Russian roulette on the MIS'd throughput ----
            q = jnp.minimum(jnp.max(thr, axis=-1), 0.95)
            rr_active = (new_depth >= self.rr_depth) & (scatter_med | scatter_surf)
            rr_continue = u_rr < q
            P = _upd_scalar(P, q, rr_active & alive & rr_continue)
            alive = alive & (~rr_active | rr_continue)

            n_rays = s["n_rays"] + jnp.sum(s["active"].astype(jnp.float32)) + jnp.sum(
                nee_active.astype(jnp.float32)
            )

            return (
                dict(
                    depth=new_depth, n_rays=n_rays, L=L, P=P, Pn=Pn,
                    ray_o=new_o, ray_d=new_d, medium=new_medium, rng=rng,
                    active=alive, prev_delta=new_prev_delta, prev_p=new_prev_p,
                ),
                None,
            )

        out, _ = jax.lax.scan(body, state, None, length=max_segments)
        return out["L"], {"n_rays": out["n_rays"]}
