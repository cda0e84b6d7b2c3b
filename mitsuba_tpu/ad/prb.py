"""Path-replay backpropagation (PRB) as a custom VJP.

TPU-native re-derivation of the reference's PRBIntegrator
(reference: src/python/python/ad/integrators/prb.py:80-258 and common.py
RBIntegrator.render_backward, common.py:828-983):

  * primal pass: ordinary path trace, records nothing (O(wavefront) memory)
  * backward pass: REPLAY the same paths (identical counter-based RNG
    streams), and per bounce accumulate parameter gradients of the local
    attached terms:
      Le      = beta * mis * emitter_eval(si)          [emitter params]
      Lr_dir  = beta * mis_em * bsdf_eval * em_weight  [bsdf + emitter params]
      Lr_ind  = L_remaining * bsdf_eval / detach(bsdf_eval)
                                                        [throughput weight —
                the reference's replace_grad(1, w) trick, prb.py:219-230]
    while consuming L (L <- L - Le - Lr_dir) so L always holds the remaining
    (suffix) radiance (prb.py:180 'L = L - Le - Lr_dir').

The per-bounce contraction dL . d(local)/d(theta) is one jax.vjp whose
residuals live only within the scan iteration, so backward memory is
O(wavefront + params) — a second ray-streaming kernel at ~forward cost
(BASELINE.json north star), NOT tape-based AD through the loop.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..integrators.path import PathIntegrator, mis_weight, _next2
from ..render.records import Ray, spawn_ray

FLOAT0 = jax.dtypes.float0


def float_leaf_mask(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return [jnp.issubdtype(jnp.asarray(l).dtype, jnp.inexact) for l in leaves]


def zero_float_grads(tree):
    mask = float_leaf_mask(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    return tuple(
        jnp.zeros_like(l) for l, m in zip(leaves, mask) if m
    )


def add_cotangent(grad_acc, cotangent_tree, ref_tree):
    """Accumulate the float-leaf cotangents of `cotangent_tree` into the flat
    tuple grad_acc (ordered like the float leaves of ref_tree)."""
    mask = float_leaf_mask(ref_tree)
    ct_leaves = jax.tree_util.tree_leaves(
        cotangent_tree, is_leaf=lambda x: x is None
    )
    out = []
    j = 0
    for ct, m in zip(ct_leaves, mask):
        if m:
            g = grad_acc[j]
            if ct is not None and jnp.asarray(ct).dtype != FLOAT0:
                g = g + ct
            out.append(g)
            j += 1
    return tuple(out)


def assemble_scene_cotangent(scene, grad_acc):
    """Rebuild a scene-shaped cotangent: float leaves from grad_acc, integer
    leaves as float0 zeros (custom_vjp contract)."""
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    mask = float_leaf_mask(scene)
    out = []
    j = 0
    for l, m in zip(leaves, mask):
        if m:
            out.append(grad_acc[j])
            j += 1
        else:
            out.append(np.zeros(jnp.shape(l), FLOAT0))
    return jax.tree_util.tree_unflatten(treedef, out)


@struct.dataclass
class PRBIntegrator(PathIntegrator):
    """Detached-sampling PRB surface integrator (reference: prb.py).
    Primal == PathIntegrator.sample; sample_backward replays with identical
    RNG draw order (the draw sequence in PathIntegrator.sample's body)."""

    is_prb = True

    def sample_backward(self, scene, rng, ray, wavelengths, dL, L_primal, active):
        """Replay pass: returns the flat tuple of gradients w.r.t. the float
        leaves of `scene`."""
        n = ray.o.shape[0]
        max_depth = self.max_depth if self.max_depth > 0 else 1024
        scene_d = jax.lax.stop_gradient(scene)
        dL = jax.lax.stop_gradient(dL)

        grad0 = zero_float_grads(scene)

        state = dict(
            depth=jnp.asarray(0, jnp.int32),
            L=jax.lax.stop_gradient(L_primal),    # remaining suffix radiance
            beta=jnp.ones_like(L_primal),
            eta=jnp.ones((n,), jnp.float32),
            ray_o=ray.o,
            ray_d=ray.d,
            rng=rng,
            active=active,
            prev_pdf=jnp.ones((n,), jnp.float32),
            prev_delta=jnp.ones((n,), bool),
            prev_p=ray.o,
            grad=grad0,
        )

        def body(s, _):
            return self._bwd_bounce(scene_d, scene, wavelengths, dL, max_depth, s), None

        out, _ = jax.lax.scan(body, state, None, length=min(max_depth, 1024))
        return out["grad"]

    def _bwd_bounce(self, scene_d, scene, wavelengths, dL, max_depth, s):
        """One PRB replay step (the scan body of sample_backward, shared with
        the regenerative backward driver).  `s['depth']` may be scalar (plain
        replay) or per-lane (regeneration); all uses broadcast."""
        nee = self.use_nee
        rng = s["rng"]
        cur_ray = Ray.make(s["ray_o"], s["ray_d"])
        si = scene_d.ray_intersect(cur_ray, s["active"])
        first = s["depth"] == 0

        # ---- detached MIS weights for emitter hits / escapes ----
        escaped = s["active"] & ~si.is_valid
        if nee:
            env_pdf = jnp.where(
                s["prev_delta"], 0.0,
                scene_d.pdf_emitter_direction_escaped(s["ray_d"]),
            )
            w_env = mis_weight(s["prev_pdf"], env_pdf)
        else:
            w_env = jnp.ones_like(s["prev_pdf"])
        hide = self.hide_emitters & first
        hit_em = s["active"] & si.is_valid
        if nee:
            em_pdf = jnp.where(
                s["prev_delta"], 0.0,
                scene_d.pdf_emitter_direction_hit(s["prev_p"], si),
            )
            w_em = mis_weight(s["prev_pdf"], em_pdf)
        else:
            w_em = jnp.ones_like(s["prev_pdf"])

        env_val_d = scene_d.eval_environment(s["ray_d"], wavelengths)
        em_val_d = scene_d.eval_emitter_hit(si, wavelengths)
        Le_det = (
            jnp.where((escaped & ~hide)[..., None], s["beta"] * w_env[..., None] * env_val_d, 0.0)
            + jnp.where((hit_em & ~hide)[..., None], s["beta"] * w_em[..., None] * em_val_d, 0.0)
        )

        active_next = s["active"] & si.is_valid & (s["depth"] + 1 < max_depth)

        # ---- identical draw order to PathIntegrator.sample ----
        u0, u2a_x, rng = _next2(rng)
        u2a_y, u_lobe, rng = _next2(rng)
        u2b_x, u2b_y, rng = _next2(rng)
        u_rr, _, rng = _next2(rng)

        if nee:
            ds, em_weight_d = scene_d.sample_emitter_direction(
                si.p, u0, jnp.stack([u2a_x, u2a_y], axis=-1), wavelengths,
                active_next, test_visibility=True, ref_n=si.n,
            )
            wo_em = si.to_local(ds.d)
            bsdf_val_em_d, bsdf_pdf_em = scene_d.bsdf_eval_pdf(
                si, wo_em, wavelengths, active_next
            )
            w_nee = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf_em))
            Lr_dir_det = jnp.where(
                active_next[..., None],
                s["beta"] * bsdf_val_em_d * em_weight_d * w_nee[..., None],
                0.0,
            )
        else:
            Lr_dir_det = jnp.zeros_like(s["L"])

        bs, bsdf_weight_d = scene_d.bsdf_sample(
            si, u_lobe, jnp.stack([u2b_x, u2b_y], axis=-1), wavelengths,
            active_next,
        )
        wo_next = bs.wo

        if nee:
            # detached ratio that carries pdf/visibility/geometry of the NEE
            # weight; attached recompute multiplies the raw radiance back in
            em_val_plain_d = scene_d.eval_emitter_sample(ds, wavelengths)
            em_ratio = jnp.where(
                em_val_plain_d > 1e-20,
                em_weight_d / jnp.maximum(em_val_plain_d, 1e-20), 0.0,
            )

        # inverse of the detached continuing weight (prb.py:222-224)
        bsdf_val_det = bsdf_weight_d * bs.pdf[..., None]
        inv_det = jnp.where(bsdf_val_det > 1e-20, 1.0 / jnp.maximum(bsdf_val_det, 1e-20), 0.0)

        # remaining radiance after consuming this vertex (prb.py:180)
        L_next = s["L"] - Le_det - Lr_dir_det

        beta_det = s["beta"]

        def attached(scene_att):
            env_a = scene_att.eval_environment(s["ray_d"], wavelengths)
            em_hit_a = scene_att.eval_emitter_hit(si, wavelengths)
            Le_a = (
                jnp.where((escaped & ~hide)[..., None], beta_det * w_env[..., None] * env_a, 0.0)
                + jnp.where((hit_em & ~hide)[..., None], beta_det * w_em[..., None] * em_hit_a, 0.0)
            )
            if nee:
                em_val_a = scene_att.eval_emitter_sample(ds, wavelengths)
                bsdf_val_em_a, _ = scene_att.bsdf_eval_pdf(
                    si, wo_em, wavelengths, active_next
                )
                Lr_dir_a = jnp.where(
                    active_next[..., None],
                    beta_det * bsdf_val_em_a * (em_val_a * em_ratio) * w_nee[..., None],
                    0.0,
                )
            else:
                Lr_dir_a = jnp.zeros_like(Le_a)
            bsdf_val_a, _ = scene_att.bsdf_eval_pdf(
                si, wo_next, wavelengths, active_next
            )
            Lr_ind_a = jnp.where(
                active_next[..., None],
                jax.lax.stop_gradient(L_next) * bsdf_val_a * inv_det,
                0.0,
            )
            Lo = Le_a + Lr_dir_a + Lr_ind_a
            return jnp.sum(dL * Lo)

        _, vjp_fn = jax.vjp(attached, scene)
        (ct,) = vjp_fn(jnp.asarray(1.0, jnp.float32))
        grad = add_cotangent(s["grad"], ct, scene)

        # ---- advance the detached path exactly like the primal ----
        wo_world = si.to_world(bs.wo)
        new_ray = spawn_ray(si.p, si.n, wo_world)
        beta = s["beta"] * bsdf_weight_d
        eta = s["eta"] * bs.eta
        alive = active_next & (bs.pdf > 0) & jnp.any(beta > 0, axis=-1)

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

        return dict(
            s,
            depth=s["depth"] + 1, L=L_next, beta=beta, eta=eta,
            ray_o=new_ray.o, ray_d=new_ray.d, rng=rng, active=alive,
            prev_pdf=bs.pdf, prev_delta=bs.delta, prev_p=si.p,
            grad=grad,
        )

    def regen_backward(self, scene, seed, spp, sensor_idx, dL_px, L_samples):
        """Regenerative PRB replay: the backward twin of path_regen_render.
        Lanes restart on their pixel's next sample with L reset to that
        sample's recorded primal radiance; the adjoint dL is per-pixel
        (L_px = sum of samples, so every sample shares its pixel's adjoint).
        Returns the flat scene-cotangent tuple like sample_backward."""
        from ..render_api import wavefront_for
        from ..integrators.path import lanes_rng, merge_rng

        film = scene.film
        n = film.crop_w * film.crop_h
        max_depth = self.max_depth if self.max_depth > 0 else 1024
        pix = jnp.arange(n, dtype=jnp.uint32)
        scene_d = jax.lax.stop_gradient(scene)
        dL = jax.lax.stop_gradient(dL_px)
        L_samples = jax.lax.stop_gradient(L_samples)

        rng0, ray0, _, _, _ = wavefront_for(
            scene, seed, pix, jnp.zeros((n,), jnp.uint32), jnp.uint32(spp),
            sensor_idx,
        )
        rng0 = lanes_rng(rng0, n)

        state = dict(
            iters=jnp.asarray(0, jnp.int32),
            s_next=jnp.zeros((n,), jnp.uint32),
            depth=jnp.zeros((n,), jnp.int32),
            L=jnp.zeros_like(L_samples[:, 0]),
            beta=jnp.ones_like(L_samples[:, 0]),
            eta=jnp.ones((n,), jnp.float32),
            ray_o=ray0.o,
            ray_d=ray0.d,
            rng=rng0,
            active=jnp.zeros((n,), bool),
            prev_pdf=jnp.ones((n,), jnp.float32),
            prev_delta=jnp.ones((n,), bool),
            prev_p=ray0.o,
            grad=zero_float_grads(scene),
        )

        def cond(s):
            work = s["active"] | (s["s_next"] < jnp.uint32(spp))
            return jnp.any(work) & (s["iters"] < spp * max_depth + 1)

        def body(s):
            regen = (~s["active"]) & (s["s_next"] < jnp.uint32(spp))
            rng_new, ray_new, _, _, _ = wavefront_for(
                scene_d, seed, pix, s["s_next"], jnp.uint32(spp), sensor_idx
            )

            def sel(a, b):
                m = regen
                while m.ndim < a.ndim:
                    m = m[..., None]
                return jnp.where(m, a, b)

            s_idx = jnp.minimum(s["s_next"], jnp.uint32(spp - 1))
            L_fresh = L_samples[jnp.arange(n), s_idx]
            s = dict(
                s,
                L=sel(L_fresh, s["L"]),
                beta=sel(jnp.ones_like(s["beta"]), s["beta"]),
                eta=sel(jnp.ones_like(s["eta"]), s["eta"]),
                ray_o=sel(ray_new.o, s["ray_o"]),
                ray_d=sel(ray_new.d, s["ray_d"]),
                rng=merge_rng(rng_new, s["rng"], regen),
                depth=sel(jnp.zeros_like(s["depth"]), s["depth"]),
                prev_pdf=sel(jnp.ones_like(s["prev_pdf"]), s["prev_pdf"]),
                prev_delta=sel(jnp.ones_like(s["prev_delta"]), s["prev_delta"]),
                prev_p=sel(ray_new.o, s["prev_p"]),
                active=s["active"] | regen,
                s_next=jnp.where(regen, s["s_next"] + 1, s["s_next"]),
            )
            s = self._bwd_bounce(scene_d, scene, None, dL, max_depth, s)
            return dict(s, iters=s["iters"] + 1)

        out = jax.lax.while_loop(cond, body, state)
        return out["grad"]
