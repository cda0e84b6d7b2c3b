"""Scene: the root pytree owning geometry + all plugin instances.

TPU-native analog of the reference Scene (src/render/scene.cpp:22-96,181-353).
Static structure (plugin types, counts, indices) lives in aux data; all
numeric parameters are differentiable pytree leaves.  Dispatch over plugin
instances is a static python loop + lane masks — the wavefront equivalent of
Dr.Jit's vectorized vcalls.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.math import lookup_rows
from .records import DirectionSample, Ray, spawn_ray
from . import shapes as shapes_mod


def _int_lookup(table, idx):
    """table[idx] for small int32 tables via the MXU one-hot path (exact for
    index-sized values; see core.math.lookup_rows for why gathers are slow)."""
    if table.shape[0] > 64:
        return table[idx]
    return lookup_rows(table.astype(jnp.float32), idx).astype(jnp.int32)


@struct.dataclass
class Scene:
    geometry: shapes_mod.Geometry
    bsdfs: tuple                 # BSDF instances
    emitters: tuple              # emitter instances
    sensors: tuple               # sensor instances
    media: tuple                 # medium instances
    phases: tuple                # phase function instances
    integrator: object
    film: object
    shape_bsdf: jnp.ndarray      # [n_shapes] int32 index into bsdfs
    shape_emitter: jnp.ndarray   # [n_shapes] int32 index into emitters, -1 none
    shape_interior_medium: jnp.ndarray   # [n_shapes] int32 index into media, -1
    shape_exterior_medium: jnp.ndarray   # [n_shapes] int32
    bbox_min: jnp.ndarray        # [3]
    bbox_max: jnp.ndarray        # [3]
    spp: int = struct.field(pytree_node=False)
    env_emitter: int = struct.field(pytree_node=False)   # index or -1
    n_channels: int = struct.field(pytree_node=False)
    polarized: bool = struct.field(pytree_node=False)
    camera_medium: int = struct.field(pytree_node=False, default=-1)
    sampler_type: str = struct.field(pytree_node=False, default="independent")
    # (key, path) pairs for traverse()/SceneParameters; static metadata
    param_paths: tuple = struct.field(pytree_node=False, default=())
    # non-uniform emitter selection probabilities [E] (reference: the optional
    # DiscreteDistribution m_emitter_distr, scene.cpp:238-250); None = uniform
    emitter_pmf: jnp.ndarray = None

    # -- intersection -------------------------------------------------------
    def ray_intersect(self, ray: Ray, active=None):
        pi = shapes_mod.ray_intersect_preliminary(self.geometry, ray, active)
        return shapes_mod.compute_surface_interaction(self.geometry, ray, pi)

    def ray_test(self, ray: Ray, active=None):
        return shapes_mod.ray_test(self.geometry, ray, active)

    def ray_intersect_and_test(self, ray: Ray, sray: Ray, active, s_active):
        """Fused closest-hit + occlusion query: ONE kernel launch over the
        concatenated 2N-ray batch (deferred-NEE path: the bounce-k shadow ray
        rides bounce-k+1's intersect call).  Only profitable where ray_test
        has no cheaper any-hit kernel (the non-BVH paths, shapes.py:581-583
        — ray_test there IS a closest-hit query)."""
        n = ray.o.shape[0]
        batch = Ray(
            o=jnp.concatenate([ray.o, sray.o]),
            d=jnp.concatenate([ray.d, sray.d]),
            maxt=jnp.concatenate([ray.maxt, sray.maxt]),
        )
        pi = shapes_mod.ray_intersect_preliminary(
            self.geometry, batch, jnp.concatenate([active, s_active])
        )
        import jax as _jax

        pi_hit = _jax.tree_util.tree_map(lambda x: x[:n], pi)
        si = shapes_mod.compute_surface_interaction(self.geometry, ray, pi_hit)
        occluded = pi.is_valid[n:] & s_active
        return si, occluded

    # -- emitter sampling (reference: scene.cpp:227-353) --------------------
    @property
    def n_emitters(self):
        return len(self.emitters)

    def sample_emitter_direction(
        self, ref_p, u0, u2, wavelengths, active, test_visibility=True, ref_n=None
    ):
        """Uniformly pick an emitter, sample a direction toward it, optionally
        shadow-test.  Returns (DirectionSample, weight [N,C]) with weight =
        radiance/pdf already including the 1/n_emitters selection factor
        (reference: Scene::sample_emitter_direction, scene.cpp:299-353)."""
        n_lanes = ref_p.shape[0]
        E = self.n_emitters
        if E == 0:
            zero = jnp.zeros((n_lanes, self.n_channels), jnp.float32)
            ds = DirectionSample(
                p=ref_p, n=jnp.zeros_like(ref_p), d=jnp.zeros_like(ref_p),
                dist=jnp.zeros((n_lanes,)), pdf=jnp.zeros((n_lanes,)),
                delta=jnp.zeros((n_lanes,), bool),
                emitter_index=jnp.full((n_lanes,), -1, jnp.int32),
                uv=jnp.zeros((n_lanes, 2), jnp.float32),
            )
            return ds, zero

        if self.emitter_pmf is None:
            sel = jnp.clip((u0 * E).astype(jnp.int32), 0, E - 1)
            sel_p = jnp.full((n_lanes,), 1.0 / E, jnp.float32)
        else:
            # power-weighted selection (reference: scene.cpp:238-250
            # m_emitter_distr): inverse-CDF on the normalized pmf
            cdf = jnp.cumsum(self.emitter_pmf)
            cdf = cdf / cdf[-1]
            sel = jnp.clip(
                jnp.searchsorted(cdf, u0, side="right", method="compare_all"),
                0, E - 1,
            ).astype(jnp.int32)
            pmf_n = self.emitter_pmf / jnp.sum(self.emitter_pmf)
            sel_p = lookup_rows(pmf_n[:, None], sel)[:, 0] if E <= 64 else pmf_n[sel]
        ds_out = None
        w_out = jnp.zeros((n_lanes, self.n_channels), jnp.float32)
        for i, em in enumerate(self.emitters):
            ds_i, w_i = em.sample_direction(
                ref_p, u2, self.geometry, wavelengths, self.n_channels, i
            )
            m = sel == i
            if ds_out is None:
                ds_out, w_out = ds_i, jnp.where(m[..., None], w_i, 0.0)
            else:
                ds_out = DirectionSample(
                    p=jnp.where(m[..., None], ds_i.p, ds_out.p),
                    n=jnp.where(m[..., None], ds_i.n, ds_out.n),
                    d=jnp.where(m[..., None], ds_i.d, ds_out.d),
                    dist=jnp.where(m, ds_i.dist, ds_out.dist),
                    pdf=jnp.where(m, ds_i.pdf, ds_out.pdf),
                    delta=jnp.where(m, ds_i.delta, ds_out.delta),
                    emitter_index=jnp.where(m, ds_i.emitter_index, ds_out.emitter_index),
                    uv=jnp.where(m[..., None], ds_i.uv, ds_out.uv),
                )
                w_out = jnp.where(m[..., None], w_i, w_out)
        # selection probability (uniform: 1/E)
        if self.emitter_pmf is None:
            ds_out = ds_out.replace(pdf=ds_out.pdf / E)
            w_out = w_out * E
        else:
            ds_out = ds_out.replace(pdf=ds_out.pdf * sel_p)
            w_out = w_out / jnp.maximum(sel_p, 1e-20)[..., None]

        if test_visibility:
            occluder_dist = ds_out.dist * (1.0 - 1e-3)
            sray = spawn_ray(
                ref_p,
                ref_n if ref_n is not None else ds_out.d,
                ds_out.d,
                maxt=occluder_dist,
            )
            occluded = self.ray_test(sray, active & (ds_out.pdf > 0))
            w_out = jnp.where(occluded[..., None], 0.0, w_out)

        w_out = jnp.where(active[..., None], w_out, 0.0)
        return ds_out, w_out

    def pdf_emitter_direction_hit(self, ref_p, si):
        """Solid-angle NEE pdf of the emitter hit at si (for MIS at emitter
        hits; reference: Scene::pdf_emitter_direction).  Returns 0 for lanes
        not hitting an emitter."""
        E = self.n_emitters
        if E == 0:
            return jnp.zeros(ref_p.shape[:-1], jnp.float32)
        shape_idx = jnp.maximum(si.shape_index, 0)
        em_idx = jnp.where(
            si.shape_index >= 0, _int_lookup(self.shape_emitter, shape_idx), -1
        )
        pmf = self._emitter_sel_pmf()
        pdf = jnp.zeros(ref_p.shape[:-1], jnp.float32)
        for i, em in enumerate(self.emitters):
            if em.is_delta or em.is_environment:
                continue
            m = em_idx == i
            if getattr(em, "needs_geometry", False):
                p_i = em.pdf_direction(ref_p, si, self.geometry)
            else:
                p_i = em.pdf_direction(ref_p, si)
            pdf = jnp.where(m, p_i * pmf[i], pdf)
        return pdf

    def _emitter_sel_pmf(self):
        """Per-emitter selection probabilities [E] (uniform unless a power
        distribution was built at load time)."""
        E = self.n_emitters
        if self.emitter_pmf is None:
            return jnp.full((E,), 1.0 / max(E, 1), jnp.float32)
        return self.emitter_pmf / jnp.sum(self.emitter_pmf)

    def pdf_emitter_direction_escaped(self, d):
        """NEE pdf for escaped rays evaluated on the environment emitter."""
        E = self.n_emitters
        if self.env_emitter < 0 or E == 0:
            return jnp.zeros(d.shape[:-1], jnp.float32)
        em = self.emitters[self.env_emitter]
        return em.pdf_direction_escaped(d) * self._emitter_sel_pmf()[self.env_emitter]

    def eval_emitter_hit(self, si, wavelengths):
        """Radiance of the emitter (if any) at surface hit si."""
        n_lanes = si.p.shape[0]
        out = jnp.zeros((n_lanes, self.n_channels), jnp.float32)
        if self.n_emitters == 0:
            return out
        shape_idx = jnp.maximum(si.shape_index, 0)
        em_idx = jnp.where(si.shape_index >= 0, _int_lookup(self.shape_emitter, shape_idx), -1)
        for i, em in enumerate(self.emitters):
            if em.is_environment or em.is_delta:
                continue
            m = em_idx == i
            out = jnp.where(m[..., None], em.eval(si, wavelengths, self.n_channels), out)
        return out

    def eval_emitter_sample(self, ds, wavelengths):
        """Differentiably re-evaluate the emitter *radiance value* of a
        detached direction sample (reference: scene.eval_emitter_direction
        used in the PRB attached recompute, prb.py:155-160).  Geometric
        factors (1/dist^2, pdf) are excluded — the PRB backward pass carries
        them as a detached ratio."""
        n_lanes = ds.d.shape[0]
        out = jnp.zeros((n_lanes, self.n_channels), jnp.float32)
        for i, em in enumerate(self.emitters):
            m = ds.emitter_index == i
            if hasattr(em, "eval_sample_value"):
                v = em.eval_sample_value(ds, wavelengths, self.n_channels)
            elif em.is_environment:
                v = em.eval_escaped(ds.d, wavelengths, self.n_channels)
            elif hasattr(em, "radiance"):
                v = em.radiance.eval(ds.uv, wavelengths, self.n_channels)
            elif hasattr(em, "intensity"):
                v = em.intensity.eval(ds.uv, wavelengths, self.n_channels)
            else:  # directional
                v = em.irradiance.eval(ds.uv, wavelengths, self.n_channels)
            out = jnp.where(m[..., None], v, out)
        return out

    def eval_environment(self, d, wavelengths):
        """Environment radiance for escaped rays along direction d."""
        if self.env_emitter < 0:
            return jnp.zeros(d.shape[:-1] + (self.n_channels,), jnp.float32)
        em = self.emitters[self.env_emitter]
        return em.eval_escaped(d, wavelengths, self.n_channels)

    # -- bsdf dispatch ------------------------------------------------------
    def bsdf_index_at(self, si):
        shape_idx = jnp.maximum(si.shape_index, 0)
        return jnp.where(si.shape_index >= 0, _int_lookup(self.shape_bsdf, shape_idx), -1)

    def _fused_diffuse_idxs(self):
        """Static (trace-time) indices of plain Lambertian instances with
        uniform reflectance.  Scenes routinely hold several of these (cbox:
        white/red/green); evaluating the SAME closed form once with a
        per-lane [K, C] reflectance row lookup replaces K masked vcall
        evaluations — the wavefront analog of Dr.Jit merging identical
        vcall targets.  Only exact when the texture row is lane-independent,
        so spectral mode (per-lane wavelengths) is excluded."""
        from .bsdfs import DiffuseBSDF
        from .textures import ConstantTexture

        return tuple(
            i for i, b in enumerate(self.bsdfs)
            if type(b) is DiffuseBSDF and type(b.reflectance) is ConstantTexture
        )

    def _fused_diffuse_rows(self, idxs, wavelengths):
        uv0 = jnp.zeros((1, 2), jnp.float32)
        return jnp.concatenate(
            [
                self.bsdfs[i].reflectance.eval(uv0, wavelengths, self.n_channels)
                for i in idxs
            ],
            axis=0,
        )  # [K, C]

    def _fused_diffuse_refl(self, idxs, b_idx, wavelengths):
        """(in_group mask [N], per-lane reflectance [N, C]) for the fused
        Lambertian group.  Select-chain rather than a one-hot matmul: K is
        small and the select's transpose is equally cheap, which matters
        inside the PRB replay's per-bounce vjp (a matmul transpose there
        measured +50% on the whole backward pass)."""
        rows = self._fused_diffuse_rows(idxs, wavelengths)
        refl = jnp.zeros(b_idx.shape + (self.n_channels,), jnp.float32)
        in_group = jnp.zeros(b_idx.shape, bool)
        for k, i in enumerate(idxs):
            hit = b_idx == i
            refl = jnp.where(hit[..., None], rows[k], refl)
            in_group = in_group | hit
        return in_group, refl

    def bsdf_eval_pdf(self, si, wo, wavelengths, active):
        """Masked vcall over BSDF instances (eval + pdf fused)."""
        from ..core.math import INV_PI
        from ..core import warp

        n_lanes = si.p.shape[0]
        val = jnp.zeros((n_lanes, self.n_channels), jnp.float32)
        pdf = jnp.zeros((n_lanes,), jnp.float32)
        b_idx = self.bsdf_index_at(si)
        fused = self._fused_diffuse_idxs() if wavelengths is None else ()
        if len(fused) >= 2:
            in_group, refl = self._fused_diffuse_refl(fused, b_idx, wavelengths)
            cos_o = wo[..., 2]
            ok = (si.wi[..., 2] > 0) & (cos_o > 0)
            m = in_group & active
            val = jnp.where(
                (m & ok)[..., None],
                refl * (INV_PI * jnp.maximum(cos_o, 0.0))[..., None],
                val,
            )
            pdf = jnp.where(
                m & ok, warp.square_to_cosine_hemisphere_pdf(wo), pdf
            )
        for i, b in enumerate(self.bsdfs):
            if i in fused and len(fused) >= 2:
                continue
            m = (b_idx == i) & active
            if not b.flags_smooth:
                continue
            v_i = b.eval(si, wo, wavelengths, self.n_channels)
            p_i = b.pdf(si, wo)
            val = jnp.where(m[..., None], v_i, val)
            pdf = jnp.where(m, p_i, pdf)
        return val, pdf

    def bsdf_sample(self, si, u_lobe, u2, wavelengths, active):
        from .records import BSDFSample
        from ..core import warp

        n_lanes = si.p.shape[0]
        b_idx = self.bsdf_index_at(si)
        bs = BSDFSample(
            wo=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n_lanes, 1)),
            pdf=jnp.zeros((n_lanes,)),
            eta=jnp.ones((n_lanes,)),
            delta=jnp.zeros((n_lanes,), bool),
        )
        weight = jnp.zeros((n_lanes, self.n_channels), jnp.float32)
        fused = self._fused_diffuse_idxs() if wavelengths is None else ()
        if len(fused) >= 2:
            in_group, refl = self._fused_diffuse_refl(fused, b_idx, wavelengths)
            wo_c = warp.square_to_cosine_hemisphere(u2)
            pdf_c = warp.square_to_cosine_hemisphere_pdf(wo_c)
            ok = si.wi[..., 2] > 0
            m = in_group & active
            bs = BSDFSample(
                wo=jnp.where(m[..., None], wo_c, bs.wo),
                pdf=jnp.where(m & ok, pdf_c, bs.pdf),
                eta=bs.eta,
                delta=bs.delta,
            )
            weight = jnp.where((m & ok)[..., None], refl, weight)
        for i, b in enumerate(self.bsdfs):
            if i in fused and len(fused) >= 2:
                continue
            m = (b_idx == i) & active
            bs_i, w_i = b.sample(u_lobe, u2, si, wavelengths, self.n_channels)
            bs = BSDFSample(
                wo=jnp.where(m[..., None], bs_i.wo, bs.wo),
                pdf=jnp.where(m, bs_i.pdf, bs.pdf),
                eta=jnp.where(m, bs_i.eta, bs.eta),
                delta=jnp.where(m, bs_i.delta, bs.delta),
            )
            weight = jnp.where(m[..., None], w_i, weight)
        return bs, weight

    # -- polarized dispatch: Mueller weights in world implicit bases --------
    def bsdf_eval_pdf_pol(self, si, wo, wavelengths, active):
        """Polarized eval: [N, C, 4, 4] world-frame Mueller f*cos weight.
        BSDFs without a polarized eval depolarize (reference behavior for
        diffuse, src/bsdfs/diffuse.cpp polarized branch)."""
        from . import mueller as mu
        from .spectrum_ops import depolarizer_weight

        n_lanes = si.p.shape[0]
        b_idx = self.bsdf_index_at(si)
        M = jnp.zeros((n_lanes, self.n_channels, 4, 4), jnp.float32)
        pdf = jnp.zeros((n_lanes,), jnp.float32)
        for i, b in enumerate(self.bsdfs):
            m = (b_idx == i) & active
            if not b.flags_smooth:
                continue
            if hasattr(b, "eval_pdf_mueller"):
                M_i, p_i = b.eval_pdf_mueller(si, wo, wavelengths, self.n_channels)
            else:
                v_i = b.eval(si, wo, wavelengths, self.n_channels)
                p_i = b.pdf(si, wo)
                M_i = depolarizer_weight(v_i)
            M = jnp.where(m[..., None, None, None], M_i, M)
            pdf = jnp.where(m, p_i, pdf)
        M = mu.to_world_mueller(M, -wo, si.wi, si.to_world_mat3())
        return M, pdf

    def bsdf_sample_pol(self, si, u_lobe, u2, wavelengths, active):
        """Polarized sample: (BSDFSample, [N, C, 4, 4] world-frame weight)."""
        from . import mueller as mu
        from .records import BSDFSample
        from .spectrum_ops import depolarizer_weight

        n_lanes = si.p.shape[0]
        b_idx = self.bsdf_index_at(si)
        bs = BSDFSample(
            wo=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n_lanes, 1)),
            pdf=jnp.zeros((n_lanes,)),
            eta=jnp.ones((n_lanes,)),
            delta=jnp.zeros((n_lanes,), bool),
        )
        M = jnp.zeros((n_lanes, self.n_channels, 4, 4), jnp.float32)
        for i, b in enumerate(self.bsdfs):
            m = (b_idx == i) & active
            if hasattr(b, "sample_pol"):
                bs_i, M_i = b.sample_pol(u_lobe, u2, si, wavelengths, self.n_channels)
            else:
                from .bsdfs import NullBSDF
                from .spectrum_ops import identity_weight

                bs_i, w_i = b.sample(u_lobe, u2, si, wavelengths, self.n_channels)
                if isinstance(b, NullBSDF):
                    M_i = identity_weight(w_i)   # polarization-preserving pass-through
                else:
                    M_i = depolarizer_weight(w_i)
            bs = BSDFSample(
                wo=jnp.where(m[..., None], bs_i.wo, bs.wo),
                pdf=jnp.where(m, bs_i.pdf, bs.pdf),
                eta=jnp.where(m, bs_i.eta, bs.eta),
                delta=jnp.where(m, bs_i.delta, bs.delta),
            )
            M = jnp.where(m[..., None, None, None], M_i, M)
        M = mu.to_world_mueller(M, -bs.wo, si.wi, si.to_world_mat3())
        return bs, M

    def phase_eval_pdf_pol(self, phase_idx, mei, wo, wavelengths, active):
        from . import mueller as mu
        from .spectrum_ops import depolarizer_weight

        n = phase_idx.shape[0]
        M = jnp.zeros((n, self.n_channels, 4, 4), jnp.float32)
        pdf = jnp.zeros((n,), jnp.float32)
        for i, ph in enumerate(self.phases):
            m = (phase_idx == i) & active
            if hasattr(ph, "eval_pdf_mueller"):
                M_i, p_i = ph.eval_pdf_mueller(mei, wo, wavelengths, self.n_channels)
            else:
                v_i, p_i = ph.eval_pdf(mei, wo, wavelengths, self.n_channels)
                M_i = depolarizer_weight(v_i)
            M = jnp.where(m[..., None, None, None], M_i, M)
            pdf = jnp.where(m, p_i, pdf)
        wi_hat = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), wo.shape)
        mat3 = jnp.stack([mei.sh_s, mei.sh_t, mei.sh_n], axis=-1)
        M = mu.to_world_mueller(M, -wo, wi_hat, mat3)
        return M, pdf

    def phase_sample_pol(self, phase_idx, mei, u1, u2, wavelengths, active):
        """Returns (wo_local, M_world [N,C,4,4] weight = eval/pdf, pdf)."""
        wo, weight, pdf = self.phase_sample(phase_idx, mei, u1, u2, wavelengths, active)
        M, _ = self.phase_eval_pdf_pol(phase_idx, mei, wo, wavelengths, active)
        M = M / jnp.maximum(pdf, 1e-12)[..., None, None, None]
        return wo, M, pdf

    @property
    def bbox_radius(self):
        return 0.5 * jnp.sqrt(jnp.sum((self.bbox_max - self.bbox_min) ** 2))

    # -- medium dispatch (reference: DRJIT_VCALL over Medium,
    #    include/mitsuba/render/medium.h:154-166) --------------------------
    def medium_majorant(self, medium_idx, p):
        """Combined majorant at p for per-lane medium indices (-1 = vacuum)."""
        out = jnp.zeros(p.shape[:-1], jnp.float32)
        for i, m in enumerate(self.media):
            sel = medium_idx == i
            out = jnp.where(sel, m.get_majorant(p, self.n_channels), out)
        return out

    def medium_majorant_spectrum(self, medium_idx, p):
        """Per-channel majorant [N, C] (the reference's spectral
        combined_extinction, medium.h:17-30)."""
        out = jnp.zeros(p.shape[:-1] + (self.n_channels,), jnp.float32)
        for i, m in enumerate(self.media):
            sel = (medium_idx == i)[..., None]
            out = jnp.where(sel, m.get_majorant_spectrum(p, self.n_channels), out)
        return out

    def medium_coefficients(self, medium_idx, p, d=None):
        """(sigma_s, sigma_n, sigma_t) [N, C] for per-lane medium indices.

        When `d` (the ray propagation direction) is given and a medium's
        phase function is a microflake distribution, sigma_t/sigma_s are
        scaled by the projected area sigma(wi = -d) and the null density
        compensates (reference: homogeneous.cpp:158-159,
        heterogeneous.cpp:193-194)."""
        n = p.shape[0]
        z = jnp.zeros((n, self.n_channels), jnp.float32)
        ss, sn, st = z, z, z
        for i, m in enumerate(self.media):
            sel = (medium_idx == i)[..., None]
            ss_i, sn_i, st_i = m.get_scattering_coefficients(p, self.n_channels)
            ph = self.phases[m.phase_index]
            if d is not None and getattr(ph, "is_microflake", False):
                from .phase import sggx_projected_area

                pa = sggx_projected_area(-d, ph.S.eval(p, 6))[..., None]
                st_pa = st_i * pa
                sn_i = jnp.maximum(sn_i + st_i - st_pa, 0.0)
                ss_i = ss_i * pa
                st_i = st_pa
            ss = jnp.where(sel, ss_i, ss)
            sn = jnp.where(sel, sn_i, sn)
            st = jnp.where(sel, st_i, st)
        return ss, sn, st

    def medium_phase_of(self, medium_idx):
        """Per-lane phase-function index for the current medium."""
        if not self.media:
            return jnp.full_like(medium_idx, -1)
        table = jnp.asarray([m.phase_index for m in self.media], jnp.int32)
        safe = jnp.clip(medium_idx, 0, len(self.media) - 1)
        return jnp.where(medium_idx >= 0, table[safe], -1)

    def phase_sample(self, phase_idx, mei, u1, u2, wavelengths, active):
        """Masked vcall: sample all phase instances, select by index.
        Returns (wo_local, weight [N,C], pdf)."""
        n = phase_idx.shape[0]
        wo = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 1))
        weight = jnp.zeros((n, self.n_channels), jnp.float32)
        pdf = jnp.zeros((n,), jnp.float32)
        for i, ph in enumerate(self.phases):
            m = (phase_idx == i) & active
            wo_i, w_i, p_i = ph.sample(mei, u1, u2, wavelengths, self.n_channels)
            wo = jnp.where(m[..., None], wo_i, wo)
            weight = jnp.where(m[..., None], w_i, weight)
            pdf = jnp.where(m, p_i, pdf)
        return wo, weight, pdf

    def phase_eval_pdf(self, phase_idx, mei, wo, wavelengths, active):
        n = phase_idx.shape[0]
        val = jnp.zeros((n, self.n_channels), jnp.float32)
        pdf = jnp.zeros((n,), jnp.float32)
        for i, ph in enumerate(self.phases):
            m = (phase_idx == i) & active
            v_i, p_i = ph.eval_pdf(mei, wo, wavelengths, self.n_channels)
            val = jnp.where(m[..., None], v_i, val)
            pdf = jnp.where(m, p_i, pdf)
        return val, pdf

    def is_null_bsdf(self, si):
        """Lanes whose hit surface has a null (medium-boundary) BSDF
        (reference: BSDF::eval_null_transmission users in volpath.cpp)."""
        from .bsdfs import NullBSDF

        b_idx = self.bsdf_index_at(si)
        out = jnp.zeros(b_idx.shape, bool)
        for i, b in enumerate(self.bsdfs):
            if isinstance(b, NullBSDF):
                out = out | (b_idx == i)
        return out

    def medium_transition(self, si, d, medium_idx):
        """New per-lane medium index after crossing surface si along d
        (reference: SurfaceInteraction::target_medium)."""
        shape_idx = jnp.maximum(si.shape_index, 0)
        interior = self.shape_interior_medium[shape_idx]
        exterior = self.shape_exterior_medium[shape_idx]
        from ..core.frame import dot

        entering = dot(d, si.n) < 0.0
        new_med = jnp.where(entering, interior, exterior)
        # only shapes that actually separate two media transition
        # (reference: SurfaceInteraction::is_medium_transition)
        is_transition = (si.shape_index >= 0) & (interior != exterior)
        return jnp.where(is_transition, new_med, medium_idx)
