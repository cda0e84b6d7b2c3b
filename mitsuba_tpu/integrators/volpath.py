"""Null-scattering volumetric path tracer with NEE + phase/BSDF MIS
(reference: src/integrators/volpath.cpp, 475 LoC).

Algorithm (the reference's dr::Loop structure, volpath.cpp:62-296, re-shaped
for TPU cost structure): the reference takes one majorant-exponential step per
loop iteration (Medium::sample_interaction, src/render/medium.cpp:40-86) and
re-runs scene intersection every iteration — cheap in a fused megakernel,
expensive for us because closest-hit is the dominant cost.  Since all media
here have *constant majorants* (reference: heterogeneous.cpp:163 constant
majorant = scale*max), the ray segment up to the next surface has a fixed
tracking distribution, so we batch: one scene intersect per OUTER iteration,
then an inner fori loop of delta-tracking steps (medium-coefficient gathers
only) until a real collision or the segment ends.  Real-vs-null splits on
sigma_t[channel]/majorant with hero-channel distance sampling
(`index_spectrum`, reference: volpath.cpp:50-59).  NEE transmittance uses
ratio tracking through null interfaces with the same batching
(reference: volpath shadow loop / volpathaos.cpp:349-452).

RNG draws are unconditional and fixed-order (outer + inner) so streams replay
identically in PRB backward passes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..render.records import MediumInteraction, Ray, spawn_ray
from ..render.spectrum_ops import get_ops
from .path import mis_weight, _next2


def sample_channel(u, n_channels):
    """Hero-channel selection for distance sampling (volpath.cpp:93)."""
    return jnp.clip((u * n_channels).astype(jnp.int32), 0, n_channels - 1)


def index_spectrum(x, channel):
    """x[..., channel] per lane (reference: volpath.cpp:50-59)."""
    return jnp.take_along_axis(x, channel[..., None], axis=-1)[..., 0]


def track_segment(scene, p0, d, seg_len, medium, channel, rng, active, n_steps,
                  detach_flight=False):
    """Delta-track one ray segment of length seg_len through `medium`
    (constant majorant): inner loop, no scene intersection.

    Uses the *per-channel* majorant (the reference's spectral
    combined_extinction): free flight is sampled at the hero channel's rate
    maj_h, and every step carries the exact spectral transmittance-ratio
    weight exp(-(maj_j - maj_h) dl).  Without this factor a shared scalar
    majorant biases non-hero channels whenever p_real -> 1 (homogeneous
    spectral media: the null branch has probability 0 and can never pay the
    compensation weight).

    Returns (reached_end [N] bool, t_real [N], beta_factor [N,C], rng) where
    lanes with reached_end=False stopped at a real collision at distance
    t_real with accumulated null-collision weight beta_factor; lanes that
    exhausted n_steps without resolving are treated as absorbed
    (beta_factor=0) — headroom is chosen so this is negligible."""
    n = p0.shape[0]
    nc = scene.n_channels
    in_medium = active & (medium >= 0)
    maj_vec = jnp.maximum(scene.medium_majorant_spectrum(medium, p0), 1e-8)
    maj_h = index_spectrum(maj_vec, channel)
    # attached-numerator / detached-sampling-pdf estimator (both in tape and
    # PRB replay mode; reference: prb_polarized.py:173-205 sigma/detach(prob)):
    # sampling decisions and probability denominators are detached, physical
    # coefficients (sigma_*, the exp ratio numerator) stay attached — the
    # hero channel's transmittance derivative rides the exp(-(maj_att -
    # maj_det) dl) factor whose primal value is 1
    maj_h_det = jax.lax.stop_gradient(maj_h)
    maj_h_ref = maj_h_det
    del detach_flight  # both modes share the estimator above

    state = dict(
        t=jnp.zeros((n,), jnp.float32),
        beta_f=jnp.ones((n, nc), jnp.float32),
        pending=in_medium,                       # still tracking
        is_real=jnp.zeros((n,), bool),
        t_real=jnp.zeros((n,), jnp.float32),
        rng=rng,
    )

    def body(s, _):
        rng = s["rng"]
        u_flight, u_event, rng = _next2(rng)
        dt = -jnp.log(jnp.maximum(1.0 - u_flight, 1e-20)) / maj_h_det
        t_new = s["t"] + dt
        passed = t_new >= seg_len
        collide = s["pending"] & ~passed
        finish = s["pending"] & passed           # survived to segment end

        p = p0 + t_new[..., None] * d
        ss, _, st = scene.medium_coefficients(medium, p, d)
        sn = jnp.maximum(maj_vec - st, 0.0)      # per-channel null density
        # sampling probability: fully detached (value AND pdf denominator) —
        # an attached denominator would add a spurious -p'/p term to the
        # gradient (detached-sampling-pdf estimator)
        prob_real = jax.lax.stop_gradient(
            jnp.clip(index_spectrum(st, channel) / maj_h_det, 0.0, 1.0)
        )
        real = collide & (u_event < prob_real)
        null = collide & ~real

        # spectral free-flight ratio over the distance actually advanced
        step_len = jnp.where(
            passed, jnp.where(jnp.isfinite(seg_len), seg_len - s["t"], 0.0), dt
        )
        ratio = jnp.exp(-(maj_vec - maj_h_ref[..., None]) * step_len[..., None])
        beta_f = jnp.where(
            (collide | finish)[..., None], s["beta_f"] * ratio, s["beta_f"]
        )

        denom_null = maj_h_det * jnp.maximum(1.0 - prob_real, 1e-8)
        denom_real = maj_h_det * jnp.maximum(prob_real, 1e-8)
        w_null = sn / denom_null[..., None]
        beta_f = jnp.where(null[..., None], beta_f * w_null, beta_f)
        # real collision weight applied here too: sigma_s / (maj_h * p_real)
        w_real = ss / denom_real[..., None]
        beta_f = jnp.where(real[..., None], beta_f * w_real, beta_f)

        return (
            dict(
                t=jnp.where(collide, t_new, s["t"]),
                beta_f=beta_f,
                pending=s["pending"] & null & (jnp.max(beta_f, axis=-1) > 0),
                is_real=s["is_real"] | real,
                t_real=jnp.where(real, t_new, s["t_real"]),
                rng=rng,
            ),
            None,
        )

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    # unresolved lanes -> absorbed
    beta_f = jnp.where(out["pending"][..., None], 0.0, out["beta_f"])
    reached_end = ~out["is_real"] & ~out["pending"]
    reached_end = jnp.where(in_medium, reached_end, active)  # vacuum passes through
    beta_f = jnp.where(in_medium[..., None], beta_f, jnp.ones_like(beta_f))
    return reached_end, out["is_real"] & in_medium, out["t_real"], beta_f, out["rng"]


def track_segment_ratio(scene, p0, d, seg_len, medium, channel, rng, active, n_steps,
                        detach_flight=False):
    """Ratio-tracking transmittance over one segment (NEE estimator):
    T = prod sigma_n/maj_h at hero-rate collisions, times the exact spectral
    ratio exp(-(maj_j - maj_h) dl) per step (see track_segment; reference:
    ratio tracking in volpathaos.cpp:349-452).  Attached-numerator /
    detached-pdf gradient estimator in both tape and PRB-replay mode."""
    n = p0.shape[0]
    nc = scene.n_channels
    in_medium = active & (medium >= 0)
    maj_vec = jnp.maximum(scene.medium_majorant_spectrum(medium, p0), 1e-8)
    maj_h = index_spectrum(maj_vec, channel)
    maj_h_det = jax.lax.stop_gradient(maj_h)
    del detach_flight

    state = dict(
        t=jnp.zeros((n,), jnp.float32),
        T=jnp.ones((n, nc), jnp.float32),
        pending=in_medium,
        rng=rng,
    )

    def body(s, _):
        rng = s["rng"]
        u_flight, _, rng = _next2(rng)
        dt = -jnp.log(jnp.maximum(1.0 - u_flight, 1e-20)) / maj_h_det
        t_new = s["t"] + dt
        collide = s["pending"] & (t_new < seg_len)
        finish = s["pending"] & (t_new >= seg_len)
        p = p0 + t_new[..., None] * d
        _, _, st = scene.medium_coefficients(medium, p, d)
        sn = jnp.maximum(maj_vec - st, 0.0)
        step_len = jnp.where(
            finish, jnp.where(jnp.isfinite(seg_len), seg_len - s["t"], 0.0), dt
        )
        surv = jnp.exp(-(maj_vec - maj_h_det[..., None]) * step_len[..., None])
        T = jnp.where((collide | finish)[..., None], s["T"] * surv, s["T"])
        ratio = sn / maj_h_det[..., None]
        T = jnp.where(collide[..., None], T * ratio, T)
        return (
            dict(
                t=jnp.where(collide, t_new, s["t"]),
                T=T,
                pending=collide & (jnp.max(T, axis=-1) > 0),
                rng=rng,
            ),
            None,
        )

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    T = jnp.where(out["pending"][..., None], 0.0, out["T"])  # unresolved -> 0

    # homogeneous media: analytic transmittance (zero variance), matching
    # the reference's Medium::transmittance_eval_pdf (medium.cpp:99-111)
    hom = jnp.zeros((n,), bool)
    for i, m in enumerate(scene.media):
        if getattr(m, "is_homogeneous", False):
            hom = hom | (medium == i)
    _, _, st0 = scene.medium_coefficients(medium, p0, d)
    len_c = jnp.where(jnp.isfinite(seg_len), seg_len, 1e8)
    T_an = jnp.exp(-st0 * jnp.maximum(len_c, 0.0)[..., None])
    T = jnp.where((hom & in_medium)[..., None], T_an, T)

    T = jnp.where(in_medium[..., None], T, jnp.ones_like(T))
    return jnp.where(active[..., None], T, jnp.ones_like(T)), out["rng"]


def estimate_transmittance(
    scene, p0, ds, medium_idx0, channel, rng, active,
    max_crossings=4, steps_per_segment=32, detach_flight=False,
):
    """Transmittance from p0 toward emitter sample ds, crossing up to
    max_crossings null-BSDF interfaces; one scene intersect per crossing."""
    n = p0.shape[0]
    nc = scene.n_channels
    d = ds.d

    state = dict(
        p=p0,
        remaining=ds.dist * (1.0 - 1e-3),
        medium=medium_idx0,
        T=jnp.ones((n, nc), jnp.float32),
        alive=active & (ds.pdf > 0),
        rng=rng,
    )

    for _ in range(max_crossings):
        ray = spawn_ray(state["p"], d, d, maxt=state["remaining"])
        si = scene.ray_intersect(ray, state["alive"])
        t_surf = jnp.where(si.is_valid, si.t, jnp.inf)
        seg_len = jnp.minimum(t_surf, state["remaining"])

        T_seg, rng = track_segment_ratio(
            scene, ray.o, d, seg_len, state["medium"], channel, state["rng"],
            state["alive"], steps_per_segment, detach_flight=detach_flight,
        )
        T = state["T"] * jnp.where(state["alive"][..., None], T_seg, 1.0)

        hit_surface = state["alive"] & si.is_valid & (t_surf < state["remaining"])
        is_null = scene.is_null_bsdf(si)
        blocked = hit_surface & ~is_null
        T = jnp.where(blocked[..., None], 0.0, T)
        cross = hit_surface & is_null

        new_medium = jnp.where(
            cross, scene.medium_transition(si, d, state["medium"]), state["medium"]
        )
        adv = jnp.where(cross, t_surf, 0.0)
        state = dict(
            p=state["p"] + (adv + 1e-4)[..., None] * d,
            remaining=state["remaining"] - adv,
            medium=new_medium,
            T=T,
            alive=cross & (jnp.max(T, axis=-1) > 0),
            rng=rng,
        )

    # lanes still needing crossings beyond the budget: conservative 0
    T = jnp.where(state["alive"][..., None], 0.0, state["T"])
    return jnp.where(active[..., None], T, jnp.zeros((n, nc), jnp.float32)), state["rng"]


@struct.dataclass
class VolPathIntegrator:
    max_depth: int = struct.field(pytree_node=False, default=8)
    rr_depth: int = struct.field(pytree_node=False, default=5)
    hide_emitters: bool = struct.field(pytree_node=False, default=False)
    max_segments: int = struct.field(pytree_node=False, default=0)  # 0 -> auto
    track_steps: int = struct.field(pytree_node=False, default=32)
    nee_crossings: int = struct.field(pytree_node=False, default=4)
    nee_steps: int = struct.field(pytree_node=False, default=32)
    # path regeneration (path.py path_regen_render): terminated lanes restart
    # on the pixel's next sample — the wavefront-compaction mode for deep
    # transport budgets (optically thick media, max_depth 32+)
    regenerate: bool = struct.field(pytree_node=False, default=False)

    def sample(self, scene, rng, ray, wavelengths, active):
        n = ray.o.shape[0]
        nc = scene.n_channels
        ops = get_ops(scene.polarized)
        max_depth = self.max_depth if self.max_depth > 0 else 64
        # outer iterations: one surface-or-real-scatter event each, plus
        # headroom for null-interface crossings
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

    def _bounce(self, scene, ops, wavelengths, max_depth, s):
        """One volumetric wavefront step (the scan body of sample(), shared
        with the regenerative driver below).  `s['channel']` is the per-lane
        hero channel, regenerated per sample in regen mode."""
        channel = s["channel"]
        # regen mode threads per-sample hero wavelengths through the state
        wavelengths = s.get("wavelengths", wavelengths)
        rng = s["rng"]
        cur_ray = Ray.make(s["ray_o"], s["ray_d"])
        si = scene.ray_intersect(cur_ray, s["active"])
        t_surf = jnp.where(si.is_valid, si.t, jnp.inf)

        # ---- delta-track the segment up to the surface ----
        reached_end, real, t_real, beta_f, rng = track_segment(
            scene, s["ray_o"], s["ray_d"], t_surf, s["medium"], channel,
            rng, s["active"], self.track_steps,
        )
        # tracking ratios are per-channel scalars (polarization-preserving)
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

        # fixed-order outer draws
        u0, u2a_x, rng = _next2(rng)
        u2a_y, u_lobe, rng = _next2(rng)
        u2b_x, u2b_y, rng = _next2(rng)
        u_rr, _, rng = _next2(rng)

        # ---- emitter hit / escape with MIS vs previous pdf ----
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
        null_cross = surface_event & is_null_surf     # no depth count
        scatter_surf = surface_event & ~is_null_surf & depth_ok
        scatter_med = real & depth_ok

        # ---- NEE ----
        nee_active = scatter_med | scatter_surf
        ref_p = jnp.where(scatter_med[..., None], p_med, si.p)
        ds, em_weight = scene.sample_emitter_direction(
            ref_p, u0, jnp.stack([u2a_x, u2a_y], axis=-1), wavelengths,
            nee_active, test_visibility=False,
        )
        nee_medium = jnp.where(
            scatter_surf, scene.medium_transition(si, ds.d, s["medium"]),
            s["medium"],
        )
        p_nee = jnp.where(
            scatter_surf[..., None],
            si.p + jnp.sign(jnp.sum(si.n * ds.d, axis=-1))[..., None] * 1e-4 * si.n,
            p_med,
        )
        T_nee, rng = estimate_transmittance(
            scene, p_nee, ds, nee_medium, channel, rng, nee_active,
            max_crossings=self.nee_crossings, steps_per_segment=self.nee_steps,
        )

        wo_med = mei.to_local(ds.d)
        wo_surf = si.to_local(ds.d)
        if ops.polarized:
            ph_val, ph_pdf = scene.phase_eval_pdf_pol(
                phase_idx, mei, wo_med, wavelengths, scatter_med
            )
            b_val, b_pdf = scene.bsdf_eval_pdf_pol(
                si, wo_surf, wavelengths, scatter_surf
            )
            f_nee = jnp.where(scatter_med[..., None, None, None], ph_val, b_val)
        else:
            ph_val, ph_pdf = scene.phase_eval_pdf(
                phase_idx, mei, wo_med, wavelengths, scatter_med
            )
            b_val, b_pdf = scene.bsdf_eval_pdf(si, wo_surf, wavelengths, scatter_surf)
            f_nee = jnp.where(scatter_med[..., None], ph_val, b_val)
        pdf_fwd = jnp.where(scatter_med, ph_pdf, b_pdf)
        w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_fwd))
        nee_contrib = ops.contrib_nee(
            beta, f_nee, em_weight * T_nee * w_nee[..., None]
        )
        L = L + ops.where_rad(nee_active, nee_contrib, jnp.zeros_like(L))

        # ---- direction sampling ----
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
        beta_int = ops.intensity_beta(beta)          # [N, C]
        alive = alive & ~(surface_event & ~is_null_surf & ~depth_ok)
        alive = alive & ~(real & ~depth_ok)
        alive = alive & (jnp.max(beta_int, axis=-1) > 0)

        # ---- Russian roulette ----
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
            ray_o=new_o, ray_d=new_d, medium=new_medium, rng=rng,
            active=alive, prev_pdf=new_prev_pdf,
            prev_delta=new_prev_delta, prev_p=new_prev_p,
        )

    def _regen_extra(self, n, scene):
        """Per-lane state (beyond the common fields) that the regenerative
        driver resets when a lane restarts; subclasses extend (volpathaos:
        refractive-interface memory)."""
        return {}

    def regen_render(self, scene, seed, spp, sensor_idx, record_samples=False):
        return volpath_regen_render(
            self, scene, seed, spp, sensor_idx, record_samples=record_samples
        )


def volpath_regen_render(integrator, scene, seed, spp, sensor_idx,
                         record_samples=False):
    """Regenerative volumetric wavefront (see path.py path_regen_render):
    lanes that terminate restart on their pixel's next sample, so deep
    transport budgets (max_depth 32+ AOS media) no longer drag every lane
    through max_segments masked iterations.

    Spectral mode (hero wavelengths per sample) converts each finished path
    to sRGB at flush time; polarized mode rotates each finished path's
    Stokes vector into the shared sensor frame at flush time — the per-pass
    post-processing the plain wavefront does in render()/render_lanes moves
    inside the loop because samples in flight carry different wavelengths /
    camera rays."""
    from ..render_api import wavefront_for
    from .path import lanes_rng, merge_rng

    film = scene.film
    n = film.crop_w * film.crop_h
    nc = scene.n_channels
    ops = get_ops(scene.polarized)
    max_depth = integrator.max_depth if integrator.max_depth > 0 else 64
    max_segments = integrator.max_segments or (max_depth + 8)
    pix = jnp.arange(n, dtype=jnp.uint32)
    spectral = nc == 4 and not scene.polarized

    def fresh(sidx):
        rng_f, ray_f, wl_f, wlp_f, _ = wavefront_for(
            scene, seed, pix, sidx, jnp.uint32(spp), sensor_idx
        )
        rng_f = lanes_rng(rng_f, n)
        u_ch, _, rng_f = _next2(rng_f)
        return rng_f, ray_f, sample_channel(u_ch, nc), wl_f, wlp_f

    rng0, ray0, ch0, wl0, wlp0 = fresh(jnp.zeros((n,), jnp.uint32))
    extra0 = integrator._regen_extra(n, scene)

    def finish(L, s):
        """Per-path film-domain value at flush time."""
        if scene.polarized:
            from ..render_api import to_sensor_mueller

            return to_sensor_mueller(s["cam_d"], L)
        if spectral:
            from ..core import spectrum as spec

            if film.srfs:
                # specfilm: per-channel SRF contraction over the path's hero
                # wavelengths (render() does this per pass; here per flush)
                uv0 = jnp.zeros((L.shape[0], 2), jnp.float32)
                inv_pdf = 1.0 / jnp.maximum(s["wl_pdf"], 1e-12)
                return jnp.stack(
                    [
                        jnp.mean(
                            srf.eval(uv0, s["wavelengths"], 4) * L * inv_pdf, -1
                        ) / norm
                        for srf, norm in zip(film.srfs, film.srf_norms)
                    ],
                    axis=-1,
                )
            xyz = spec.spectrum_to_xyz(L, s["wavelengths"], s["wl_pdf"])
            return jnp.clip(spec.xyz_to_srgb(xyz), 0.0, None)
        return L

    npx = (len(film.srfs) if film.srfs else 3) if spectral else nc
    L_px0 = (
        jnp.zeros((n, nc, 4), jnp.float32) if scene.polarized
        else jnp.zeros((n, npx), jnp.float32)
    )

    state = dict(
        iters=jnp.asarray(0, jnp.int32),
        n_rays=jnp.asarray(0.0, jnp.float32),
        s_next=jnp.zeros((n,), jnp.uint32),
        L_px=L_px0,
        depth=jnp.zeros((n,), jnp.int32),
        L=ops.zero_radiance(n, nc),
        beta=ops.one(n, nc),
        ray_o=ray0.o,
        ray_d=ray0.d,
        medium=jnp.full((n,), scene.camera_medium, jnp.int32),
        channel=ch0,
        rng=rng0,
        active=jnp.zeros((n,), bool),
        prev_pdf=jnp.ones((n,), jnp.float32),
        prev_delta=jnp.ones((n,), bool),
        prev_p=ray0.o,
        **extra0,
    )
    if nc == 4:
        # hero wavelengths ride the state in every spectral mode (incl.
        # polarized, where the film keeps raw I/Q/U/V[.lambda])
        state["wavelengths"] = wl0
        state["wl_pdf"] = wlp0
    if scene.polarized:
        state["cam_d"] = ray0.d
    if record_samples:
        # raw integrator-domain radiance per (pixel, sample): [n, spp, C]
        # unpolarized, [n, spp, C, 4] polarized Stokes
        state["cur_sample"] = jnp.zeros((n,), jnp.uint32)
        state["L_samples"] = jnp.zeros(
            (n, spp) + state["L"].shape[1:], jnp.float32
        )

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

        mask_px = regen
        while mask_px.ndim < state["L_px"].ndim:
            mask_px = mask_px[..., None]
        upd = dict(
            # flush the finished path, converted to the film domain
            L_px=s["L_px"] + jnp.where(mask_px, finish(s["L"], s), 0.0),
            L=sel(jnp.zeros_like(s["L"]), s["L"]),
            beta=sel(ops.one(n, nc), s["beta"]),
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
        )
        upd.update({k: sel(v, s[k]) for k, v in extra0.items()})
        if nc == 4:
            upd["wavelengths"] = sel(wl_new, s["wavelengths"])
            upd["wl_pdf"] = sel(wlp_new, s["wl_pdf"])
        if scene.polarized:
            upd["cam_d"] = sel(ray_new.d, s["cam_d"])
        if record_samples:
            # flushed radiance belongs to the sample the lane held BEFORE
            # this regeneration (raw integrator-domain L)
            flush = regen & (s["s_next"] > 0)
            fm = flush.reshape((n,) + (1,) * (s["L"].ndim - 1))
            upd["L_samples"] = s["L_samples"].at[
                jnp.arange(n), s["cur_sample"]
            ].add(jnp.where(fm, s["L"], 0.0))
            upd["cur_sample"] = jnp.where(regen, s["s_next"], s["cur_sample"])
        s = dict(s, **upd)
        s = integrator._bounce(scene, ops, None, max_depth, s)
        return dict(s, iters=s["iters"] + 1)

    out = jax.lax.while_loop(cond, body, state)
    # lanes exit inactive: flush every lane's final path
    started = out["s_next"] > 0
    L_px = out["L_px"] + jnp.where(
        started.reshape((n,) + (1,) * (out["L_px"].ndim - 1)),
        finish(out["L"], out), 0.0,
    )
    aux = {"n_rays": out["n_rays"], "wavefront_iters": out["iters"]}
    if record_samples:
        sm = started.reshape((n,) + (1,) * (out["L"].ndim - 1))
        aux["L_samples"] = out["L_samples"].at[
            jnp.arange(n), out["cur_sample"]
        ].add(jnp.where(sm, out["L"], 0.0))
    return L_px, aux
