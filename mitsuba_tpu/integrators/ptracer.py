"""Adjoint particle tracer: light paths splatted onto the sensor
(reference: src/integrators/ptracer.cpp, 389 LoC +
AdjointIntegrator::sample, include/mitsuba/render/integrator.h:580-648).

Wavefront design: N particles start on emitters, bounce through the scene
with the usual SoA scan, and at every vertex connect to the pinhole camera —
a *scatter* splat into the film (segment-sum over pixel ids; the one place
the aligned-film fast path does not apply).

Camera-connection weight for a pinhole perspective sensor: a vertex at p with
path weight alpha (radiance units) contributes to the pixel containing its
image-plane projection

    V_j += alpha * f(w_i -> w_cam) * visibility / (d^2 * A_pix * cos^3 theta)

where f includes the surface cosine, theta is the angle to the camera axis,
and A_pix is the pixel footprint on the z=1 image plane (importance of the
pinhole measurement, cf. Veach 1997 ch. 8).  Emitter-start weights divide by
the position/direction sampling pdfs as usual.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..core import warp
from ..core.frame import coordinate_system, dot, normalize
from ..core.math import lookup_rows
from ..render.records import Ray, spawn_ray
from .path import _next2


def _sample_emitter_ray(scene, u_sel, u_pos, u_dir, wavelengths):
    """Sample an initial particle: position + direction + weight [N, C]
    (reference: Scene::sample_emitter_ray, scene.cpp:260)."""
    n = u_sel.shape[0]
    nc = scene.n_channels
    E = scene.n_emitters
    sel = jnp.clip((u_sel * E).astype(jnp.int32), 0, max(E - 1, 0))

    p = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 1))
    weight = jnp.zeros((n, nc), jnp.float32)
    n_emit = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 1))
    # per-lane emission data for the depth-0 emitter->camera connection:
    # radiance at the emission point and 1/pdf_pos (area measure); 0 for
    # delta-position or collimated emitters (no camera connection)
    rad0 = jnp.zeros((n, nc), jnp.float32)
    inv_ppos = jnp.zeros((n,), jnp.float32)

    from ..render.emitters import AreaEmitterArray

    for i, em in enumerate(scene.emitters):
        m = sel == i
        if isinstance(em, AreaEmitterArray):   # fused many-area-light group
            geom = scene.geometry
            T = em.tri_index.shape[0]
            u = u_pos[..., 0]
            k = jnp.clip(
                jnp.searchsorted(em.tri_cdf, u, side="right",
                                 method="compare_all" if T <= 4096 else "scan"),
                0, T - 1,
            ).astype(jnp.int32)
            cdf_lo = jnp.concatenate([jnp.zeros((1,), jnp.float32), em.tri_cdf[:-1]])
            tbl = jnp.concatenate(
                [
                    geom.tri_v0[em.tri_index], geom.tri_e1[em.tri_index],
                    geom.tri_e2[em.tri_index], geom.tri_ng[em.tri_index],
                    cdf_lo[:, None], em.tri_cdf[:, None],
                    em.tri_light.astype(jnp.float32)[:, None],
                    em.area_pdf[em.tri_light][:, None],
                ],
                axis=-1,
            )
            row = lookup_rows(tbl, k)
            v0, e1 = row[..., 0:3], row[..., 3:6]
            e2, ng = row[..., 6:9], row[..., 9:12]
            lo = row[..., 12]
            seg = jnp.maximum(row[..., 13] - lo, 1e-20)
            light = row[..., 14].astype(jnp.int32)
            p_area = jnp.maximum(row[..., 15], 1e-20)
            u0r = jnp.clip((u - lo) / seg, 0.0, 1.0)
            bary = warp.square_to_uniform_triangle(
                jnp.stack([u0r, u_pos[..., 1]], axis=-1)
            )
            p_i = v0 + bary[..., 0:1] * e1 + bary[..., 1:2] * e2
            rad = em._value_rows(light, wavelengths, nc)
            local = warp.square_to_cosine_hemisphere(u_dir)
            s_ax, t_ax = coordinate_system(ng)
            d_i = local[..., 0:1] * s_ax + local[..., 1:2] * t_ax + local[..., 2:3] * ng
            # weight = Le * pi / pdf_pos (cosine-direction pdf cancels cos/pi)
            w_i = rad * (np.pi / p_area)[..., None]
            p = jnp.where(m[..., None], p_i, p)
            d = jnp.where(m[..., None], d_i, d)
            n_emit = jnp.where(m[..., None], ng, n_emit)
            weight = jnp.where(m[..., None], w_i, weight)
            rad0 = jnp.where(m[..., None], rad, rad0)
            inv_ppos = jnp.where(m, 1.0 / p_area, inv_ppos)
        elif hasattr(em, "tri_index"):          # area emitter
            scaled = u_pos[..., 0] * em.total_area
            k = jnp.clip(
                jnp.searchsorted(em.tri_cdf, scaled, side="right", method="compare_all"), 0,
                em.tri_cdf.shape[0] - 1,
            )
            # packed one-hot lookup: see core.math.lookup_rows (TPU gathers
            # from small tables are pathologically slow)
            geom = scene.geometry
            cdf_lo = jnp.concatenate([jnp.zeros((1,), jnp.float32), em.tri_cdf[:-1]])
            tbl = jnp.concatenate(
                [
                    geom.tri_v0[em.tri_index], geom.tri_e1[em.tri_index],
                    geom.tri_e2[em.tri_index], geom.tri_ng[em.tri_index],
                    cdf_lo[:, None], em.tri_cdf[:, None],
                ],
                axis=-1,
            )
            row = lookup_rows(tbl, k)
            v0, e1 = row[..., 0:3], row[..., 3:6]
            e2, ng = row[..., 6:9], row[..., 9:12]
            lo = row[..., 12]
            seg = jnp.maximum(row[..., 13] - lo, 1e-20)
            u0r = jnp.clip((scaled - lo) / seg, 0.0, 1.0)
            bary = warp.square_to_uniform_triangle(
                jnp.stack([u0r, u_pos[..., 1]], axis=-1)
            )
            p_i = v0 + bary[..., 0:1] * e1 + bary[..., 1:2] * e2
            rad = em.radiance.eval(bary, wavelengths, nc)
            if getattr(em, "is_directional_area", False):
                # collimated panel: emit exactly along the normal
                # (reference: src/emitters/directionalarea.cpp)
                d_i = jnp.broadcast_to(ng, (n, 3))
                w_i = rad * em.total_area
            else:
                # cosine-weighted emission direction around the normal
                local = warp.square_to_cosine_hemisphere(u_dir)
                s_ax, t_ax = coordinate_system(ng)
                d_i = local[..., 0:1] * s_ax + local[..., 1:2] * t_ax + local[..., 2:3] * ng
                # weight = Le * A * pi  (pdf_pos = 1/A, pdf_dir = cos/pi, x cos)
                w_i = rad * (em.total_area * np.pi)
            p = jnp.where(m[..., None], p_i, p)
            d = jnp.where(m[..., None], d_i, d)
            n_emit = jnp.where(m[..., None], ng, n_emit)
            weight = jnp.where(m[..., None], w_i, weight)
            if not getattr(em, "is_directional_area", False):
                rad0 = jnp.where(m[..., None], rad, rad0)
                inv_ppos = jnp.where(m, em.total_area, inv_ppos)
        elif hasattr(em, "position"):          # point emitter
            d_i = warp.square_to_uniform_sphere(u_dir)
            inten = em.intensity.eval(jnp.zeros((n, 2)), wavelengths, nc)
            w_i = inten * (4.0 * np.pi)
            p = jnp.where(m[..., None], jnp.broadcast_to(em.position, (n, 3)), p)
            d = jnp.where(m[..., None], d_i, d)
            n_emit = jnp.where(m[..., None], d_i, n_emit)
            weight = jnp.where(m[..., None], w_i, weight)
        # constant/directional particle emission: skipped (their direct
        # contribution dominates through the camera path; reference ptracer
        # likewise connects the sensor separately)
    weight = weight * E
    return p, d, n_emit, weight, rad0, inv_ppos * E


def connect_to_camera(scene, film, sensor, p, f_val, active):
    """Project vertex p onto the film; returns (pixel_id [N], contrib [N, C],
    valid).  f_val: bsdf/emission value toward the camera (cos included)."""
    cam_o = sensor.to_world_m[:3, 3]
    R = sensor.to_world_m[:3, :3]
    to_cam = cam_o - p
    dist2 = jnp.sum(to_cam * to_cam, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    d = to_cam / dist[..., None]
    # camera-space direction of the vertex as seen from the camera
    v_cam = (p - cam_o) @ R            # world -> camera (R orthonormal)
    z = v_cam[..., 2]
    in_front = z > 1e-6
    x_ndc = v_cam[..., 0] / jnp.maximum(z, 1e-6)
    y_ndc = v_cam[..., 1] / jnp.maximum(z, 1e-6)
    tx = sensor.tan_half_fov_x
    ty = tx / sensor.aspect
    # film u: x = (1-2u) tx  =>  u = (1 - x/tx)/2 ; v analogous
    u = 0.5 * (1.0 - x_ndc / tx)
    v = 0.5 * (1.0 - y_ndc / ty)
    on_film = (u >= 0) & (u < 1) & (v >= 0) & (v < 1) & in_front
    px = jnp.clip((u * film.width).astype(jnp.int32), 0, film.width - 1)
    py = jnp.clip((v * film.height).astype(jnp.int32), 0, film.height - 1)
    pixel = py * film.width + px

    cos_cam = z / dist                     # angle to camera axis
    a_pix = (2 * tx / film.width) * (2 * ty / film.height)
    w_cam = 1.0 / jnp.maximum(dist2 * a_pix * cos_cam**3, 1e-12)
    contrib = f_val * w_cam[..., None]
    valid = active & on_film
    return pixel, jnp.where(valid[..., None], contrib, 0.0), valid, d, dist


@struct.dataclass
class PTracerIntegrator:
    """Forward (adjoint) particle tracer.  Not a per-lane radiance sampler:
    render() routes to trace_particles when it sees is_ptracer."""

    max_depth: int = struct.field(pytree_node=False, default=8)
    rr_depth: int = struct.field(pytree_node=False, default=5)

    is_ptracer = True

    def trace_particles(self, scene, rng, n_particles, wavelengths, sensor_idx=0):
        """Returns a flat film accumulator [H*W, C] (sum of contributions;
        divide by n_particles for the image)."""
        film = scene.film
        sensor = scene.sensors[sensor_idx]
        nc = scene.n_channels
        n = n_particles

        u_sel, u_p0, rng = _next2(rng)
        u_p1, u_d0, rng = _next2(rng)
        u_d1, _, rng = _next2(rng)
        p0, d0, n_emit, alpha, rad0, inv_ppos = _sample_emitter_ray(
            scene, u_sel, jnp.stack([u_p0, u_p1], axis=-1),
            jnp.stack([u_d0, u_d1], axis=-1), wavelengths,
        )

        image = jnp.zeros((film.width * film.height, nc), jnp.float32)

        # direct emitter -> camera connection (depth 0): each particle's OWN
        # emission point/radiance (per-lane rad0 and 1/pdf_pos from
        # _sample_emitter_ray; one connection regardless of light count —
        # the previous per-emitter loop overcounted multi-area-light scenes)
        sel_m = inv_ppos > 0
        to_cam = normalize(sensor.to_world_m[:3, 3] - p0)
        cos_e = jnp.maximum(dot(n_emit, to_cam), 0.0)
        sray = spawn_ray(p0, n_emit, to_cam)
        dist_cam = jnp.sqrt(
            jnp.sum((sensor.to_world_m[:3, 3] - p0) ** 2, axis=-1)
        )
        si_occ = scene.ray_intersect(sray, sel_m)
        vis = ~(si_occ.is_valid & (si_occ.t < dist_cam * (1 - 1e-3)))
        # measurement contribution of emitted radiance: area-sampled vertex
        # with pdf p_pos -> weight rad * cos_e / p_pos (the standard W_e
        # connection with f = rad * cos_e)
        pix, contrib, valid, _, _ = connect_to_camera(
            scene, film, sensor, p0,
            rad0 * (cos_e * inv_ppos)[..., None],
            sel_m & vis & (cos_e > 0),
        )
        image = image + jax.ops.segment_sum(
            jnp.where(valid[..., None], contrib, 0.0), pix,
            num_segments=film.width * film.height,
        )

        state = dict(
            depth=jnp.asarray(0, jnp.int32),
            alpha=alpha,
            ray_o=spawn_ray(p0, n_emit, d0).o,
            ray_d=d0,
            rng=rng,
            active=jnp.max(alpha, axis=-1) > 0,
            image=image,
        )

        def body(s, _):
            rng = s["rng"]
            u_lobe, u2x, rng = _next2(rng)
            u2y, u_rr, rng = _next2(rng)

            ray = Ray.make(s["ray_o"], s["ray_d"])
            si = scene.ray_intersect(ray, s["active"])
            hit = s["active"] & si.is_valid

            # connect this surface vertex to the camera
            cam_o = scene.sensors[sensor_idx].to_world_m[:3, 3]
            to_cam = normalize(jnp.broadcast_to(cam_o, si.p.shape) - si.p)
            wo_cam = si.to_local(to_cam)
            # importance transport: evaluate bsdf for (wi, wo_cam)
            f_cam, _ = scene.bsdf_eval_pdf(si, wo_cam, wavelengths, hit)
            sray = spawn_ray(si.p, si.n, to_cam)
            dist_cam = jnp.sqrt(jnp.sum((cam_o - si.p) ** 2, axis=-1))
            si_occ = scene.ray_intersect(sray, hit)
            vis = ~(si_occ.is_valid & (si_occ.t < dist_cam * (1 - 1e-3)))
            pix, contrib, valid, _, _ = connect_to_camera(
                scene, film, scene.sensors[sensor_idx], si.p,
                s["alpha"] * f_cam, hit & vis,
            )
            image = s["image"] + jax.ops.segment_sum(
                jnp.where(valid[..., None], contrib, 0.0), pix,
                num_segments=film.width * film.height,
            )

            # bounce
            bs, bw = scene.bsdf_sample(
                si, u_lobe, jnp.stack([u2x, u2y], axis=-1), wavelengths, hit
            )
            wo_world = si.to_world(bs.wo)
            nray = spawn_ray(si.p, si.n, wo_world)
            alpha = jnp.where(hit[..., None], s["alpha"] * bw, s["alpha"])
            alive = hit & (bs.pdf > 0) & (jnp.max(alpha, axis=-1) > 0)

            rr_on = s["depth"] + 1 >= self.rr_depth
            q = jnp.minimum(jnp.max(alpha, axis=-1), 0.95)
            cont = u_rr < q
            alpha = jnp.where(
                (rr_on & alive)[..., None], alpha / jnp.maximum(q, 1e-6)[..., None], alpha
            )
            alive = alive & (~rr_on | cont)

            return (
                dict(
                    depth=s["depth"] + 1, alpha=alpha, ray_o=nray.o,
                    ray_d=wo_world, rng=rng, active=alive, image=image,
                ),
                None,
            )

        out, _ = jax.lax.scan(body, state, None, length=max(self.max_depth - 1, 1))
        return out["image"]
