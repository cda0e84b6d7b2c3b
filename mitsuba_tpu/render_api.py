"""Top-level render entry points (reference: mi.render / mi.render_1 /
mi.render_test, src/python/python/util.py:356-718 and
SamplingIntegrator::render, src/render/integrator.cpp:150-397).

Wavefront architecture: one jitted pass renders W*H*spp_pass lanes in
pixel-major SoA layout; spp is split into passes to bound HBM (the analog of
the reference's multi-pass wavefront split, integrator.cpp:277-295).  Lane RNG
streams are keyed by the *global* sample index so results are independent of
the pass partitioning and replay identically in PRB backward passes.

Differentiation: render() is differentiable w.r.t. scene parameters via
jax.grad through the pass (tape-based, small scenes) or the PRB custom-vjp
integrators in mitsuba_tpu.ad (constant-memory replay).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .core import spectrum as spec
from .core.rng import RNG
from .render.film import develop, sample_filter_offset


def _pass_lanes(film, spp_pass):
    return film.crop_w * film.crop_h * spp_pass


def make_wavefront(scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx):
    """Deterministic wavefront setup: per-lane RNG streams keyed by the
    *global* sample index (partition-invariant and PRB-replayable), camera
    rays, and sampled wavelengths.  Returns (rng, ray, wavelengths, wl_pdf).

    `spp_total` may be a traced uint32 (the RNG keying is pure arithmetic);
    only the stratified sampler family needs it concrete for its strata grid,
    and only those samplers force it static (see _render_pass).

    Returns (rng, ray, wavelengths, wl_pdf, jitter) — `jitter` is the in-pixel
    film offset, needed again at develop() time by the weighted-reconstruction
    filters (mitchell/catmullrom/lanczos)."""
    lane_local = jnp.uint32(lane0) + jnp.arange(n, dtype=jnp.uint32)
    pix = lane_local // jnp.uint32(spp_pass)
    s_local = lane_local % jnp.uint32(spp_pass)
    return wavefront_for(
        scene, seed, pix, jnp.uint32(pass_base) + s_local, spp_total, sensor_idx
    )


def wavefront_for(scene, seed, pix, sidx, spp_total, sensor_idx):
    """Per-lane wavefront setup for explicit (pixel, sample-index) pairs —
    the core of make_wavefront, also used by the path-regeneration driver
    (lanes restart at their own sample indices mid-loop)."""
    film = scene.film
    sensor = scene.sensors[sensor_idx]
    from .render.film import film_tiled, seq_to_pixel

    if film_tiled(film):
        # tiled lane order for BVH scenes (film.py Film.tiled): callers pass
        # sequential indices; the true pixel id is the tile-order target.
        # RNG below is keyed by the TRUE pixel, so per-sample values are
        # identical to the scanline order and develop() inverts the layout.
        pix = seq_to_pixel(film, pix)
    s_local = sidx
    global_sample = pix * jnp.uint32(spp_total) + s_local

    stype = getattr(scene, "sampler_type", "independent")
    if stype == "orthogonal":
        # strength-2 orthogonal array over ALL dimensions (Bose construction;
        # reference: src/samplers/orthogonal.cpp) — every dim pair of a
        # pixel's samples is a correlated multi-jittered pattern
        from .core.rng import smallest_prime_resolution

        rng = RNG(
            seed, global_sample,
            pixel=pix, sidx=s_local,
            oa=smallest_prime_resolution(spp_total),
        )
    elif stype != "independent":
        # low-discrepancy path dimensions: every dim pair is an
        # Owen-scrambled (0,2)-sequence over the pixel's samples
        # (reference: src/samplers/*; core/rng.py LDS mode)
        rng = RNG(
            seed, global_sample,
            pixel=pix, sidx=s_local, lds=True,
        )
    else:
        rng = RNG(seed, global_sample)

    # dims 0-1: film-plane jitter; 2-3: aperture; 4: wavelength
    jx, jy, rng = rng.next_2d()
    ax, ay, rng = rng.next_2d()
    uw, _, rng = rng.next_2d()

    # film-plane sample point: stratified/low-discrepancy samplers act on
    # the jitter dimension (reference: src/samplers/*; see render/samplers.py)
    u_film = jnp.stack([jx, jy], axis=-1)
    if stype in ("stratified",):
        from .render.samplers import stratified_2d

        u_film = stratified_2d(s_local, spp_total, u_film)
    elif stype == "multijitter":
        from .render.samplers import multijitter_2d

        u_film = multijitter_2d(s_local, spp_total, pix, seed)
    elif stype == "orthogonal":
        # dims 0-1 of the Bose OA already form the CMJ-style film pattern
        pass
    elif stype in ("ldsampler", "sobol"):
        from .render.samplers import sobol_2d

        u_film = sobol_2d(s_local, pix, seed)
    jitter = sample_filter_offset(film.rfilter, u_film)
    # pixel-major over the CROP window (film.cpp crop_offset/crop_size)
    px = (pix % jnp.uint32(film.crop_w)).astype(jnp.float32) + film.crop_offset[0]
    py = (pix // jnp.uint32(film.crop_w)).astype(jnp.float32) + film.crop_offset[1]
    pos = (jnp.stack([px, py], axis=-1) + jitter) / jnp.asarray(
        [film.width, film.height], jnp.float32
    )
    ray = sensor.sample_ray(pos, jnp.stack([ax, ay], axis=-1))

    wavelengths = None
    wl_pdf = None
    if scene.n_channels == 4:
        fixed = getattr(sensor, "fixed_wavelength", None)
        wavelengths = spec.sample_wavelengths_hero(uw, n=4)
        wl_pdf = spec.pdf_uniform_wavelength(wavelengths)
        if fixed is not None:
            pinned = jnp.broadcast_to(fixed, wavelengths.shape)
            use_pin = fixed > 0
            wavelengths = jnp.where(use_pin, pinned, wavelengths)
            wl_pdf = jnp.where(use_pin, 1.0, wl_pdf)
    return rng, ray, wavelengths, wl_pdf, jitter


def sensor_stokes_rotation(ray_d):
    """Per-lane [N, 4, 4] rotation from the camera ray's implicit Stokes basis
    to the global basis perpendicular to the vertical (+z), per Chowdhary
    et al. 2020 (reference: to_sensor_mueller, common.py:304-326,
    integrator.cpp:1245-1267)."""
    from .render import mueller as mu
    from .core.frame import cross, normalize

    fwd = -ray_d
    current = mu.stokes_basis(fwd)
    vertical = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    tmp = cross(fwd, jnp.broadcast_to(vertical, fwd.shape))
    is_vertical = jnp.sum(tmp * tmp, axis=-1, keepdims=True) < 1e-24
    fallback = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), fwd.shape)
    target = jnp.where(
        is_vertical, fallback, cross(fwd, normalize(jnp.where(is_vertical, fallback, tmp)))
    )
    return mu.rotate_stokes_basis(fwd, current, target)    # [N, 4, 4]


def to_sensor_mueller(ray_d, L):
    """Rotate per-lane Stokes vectors into the shared sensor frame so Stokes
    vectors from different rays can be summed.  L: [N, C, 4]."""
    R = sensor_stokes_rotation(ray_d)
    return jnp.einsum("nij,ncj->nci", R, L)


def render_lanes(scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx):
    """Render lanes [lane0, lane0+n) of a wavefront pass."""
    # derive triangle tables from the vertex buffer inside the trace so
    # gradients flow to `vertex_positions` (Geometry.refresh docstring)
    scene = scene.replace(geometry=scene.geometry.refresh())
    rng, ray, wavelengths, wl_pdf, jitter = make_wavefront(
        scene, seed, lane0, n, pass_base, spp_pass, spp_total, sensor_idx
    )
    active = jnp.ones((n,), bool)
    L, aux = scene.integrator.sample(scene, rng, ray, wavelengths, active)
    if scene.polarized and L.ndim == 3:
        L = to_sensor_mueller(ray.d, L)
    # NaN/negative splat guard (reference: imageblock.cpp:122-126 warn flags)
    from .utils.observe import warn_invalid

    L, inv_stats = warn_invalid(
        L, active,
        polarized=scene.polarized and L.ndim == 3,
        # signed integrator outputs (AOV normals/positions) must not be
        # negativity-clamped (imageblock warn_negative is radiance-only)
        clamp_negative=not getattr(scene.integrator, "signed_output", False),
    )
    aux = dict(aux)
    aux.update(inv_stats)
    aux["film_jitter"] = jitter
    return L, wavelengths, wl_pdf, aux


@partial(jax.jit, static_argnames=("spp_pass", "sensor_idx"))
def _render_pass_dyn(scene, seed, pass_base, spp_pass, spp_total, sensor_idx):
    """One full wavefront pass; spp_total traced — one compile serves every
    total-spp (multi-pass accumulation, progressive renders)."""
    n = _pass_lanes(scene.film, spp_pass)
    return render_lanes(scene, seed, 0, n, pass_base, spp_pass, spp_total, sensor_idx)


@partial(jax.jit, static_argnames=("spp_pass", "spp_total", "sensor_idx"))
def _render_pass_static(scene, seed, pass_base, spp_pass, spp_total, sensor_idx):
    """Variant with concrete spp_total for the stratified sampler family
    (their strata grids are shape-defining)."""
    n = _pass_lanes(scene.film, spp_pass)
    return render_lanes(scene, seed, 0, n, pass_base, spp_pass, spp_total, sensor_idx)


def _render_pass(scene, seed, pass_base, spp_pass, spp_total, sensor_idx):
    if getattr(scene, "sampler_type", "independent") in (
        "stratified", "multijitter", "orthogonal",
    ):
        return _render_pass_static(scene, seed, pass_base, spp_pass, spp_total, sensor_idx)
    return _render_pass_dyn(
        scene, seed, jnp.uint32(pass_base), spp_pass, jnp.uint32(spp_total), sensor_idx
    )


class CancelToken:
    """Cooperative cancellation for render() (reference:
    Integrator::cancel() + m_stop polled per block, integrator.cpp:120-122,
    248).  Pass one to render(cancel=...); calling cancel() — e.g. from a
    signal handler or another thread — makes the render stop at the next
    pass boundary and return the unbiased partial accumulation."""

    def __init__(self):
        self.cancelled = False

    def cancel(self):
        self.cancelled = True


def render(scene, params=None, sensor=0, seed=0, spp=None, spp_per_pass=None,
           seed_grad=None, integrator=None, spp_grad=None, timeout=None,
           cancel=None):
    """Render to an image tensor [H, W, C] (reference: mi.render,
    util.py:512-626).  `params` accepts a SceneParameters whose scene is then
    rendered (mirroring the reference's signature).  `seed_grad` seeds the
    differential phase of PRB backward passes; it defaults to a TEA hash of
    `seed` so the primal and gradient estimates are decorrelated (reference:
    util.py:617-622 — correlated seeds bias nonlinear-loss optimization).
    `integrator` overrides the scene's integrator for this render: an
    integrator instance or a scene-dict spec (reference: the `integrator`
    argument of mi.render, util.py:518).

    `timeout` (seconds of wall clock) and `cancel` (a CancelToken) stop the
    multipass accumulation loop early at a pass boundary and return the
    unbiased average of the passes completed so far (reference: the render
    `timeout` property and Integrator::cancel(), integrator.cpp:24,120-122).
    Granularity is one pass, so when either is given and no explicit
    spp_per_pass was requested, spp is split into ~8 passes to create
    checkpoints.  Single-launch drivers (ptracer/projective/regenerative)
    cannot stop mid-launch and ignore both."""
    if params is not None and hasattr(params, "scene"):
        scene = params.scene
    if integrator is not None:
        if isinstance(integrator, dict):
            from .integrators import make_integrator

            integrator = make_integrator(integrator)
        scene = scene.replace(integrator=integrator)
    film = scene.film
    spp = spp or scene.spp
    if spp_per_pass is None and (timeout is not None or cancel is not None):
        spp_per_pass = max(1, spp // 8)
    spp_per_pass = min(spp_per_pass or spp, spp)
    n_passes = (spp + spp_per_pass - 1) // spp_per_pass
    from .ad.render_ad import derive_seed_grad

    seed_grad = derive_seed_grad(seed, seed_grad)

    if getattr(scene.integrator, "is_ptracer", False):
        return _render_ptracer(scene, seed, spp, sensor)

    if getattr(scene.integrator, "is_projective", False):
        # boundary-aware custom-vjp render op (reference: PSIntegrator
        # render_ad, common.py:1422-1518)
        from .ad.projective import projective_render

        return projective_render(
            scene, jnp.uint32(seed), spp, sensor,
            scene.integrator.sppp, scene.integrator.sppi,
        )

    if getattr(scene.integrator, "regenerate", False):
        # volpath-family drivers handle spectral + polarized in-loop; the
        # surface path driver is rgb/mono
        volfam = hasattr(scene.integrator, "_bounce")
        supported = volfam or (scene.n_channels != 4 and not scene.polarized)
        if getattr(scene.integrator, "is_prb", False):
            # differentiable regeneration needs a regen_backward replay; the
            # volumetric drivers pull the film adjoint back through the
            # in-loop flush conversion (sensor Stokes rotation / spectral
            # sRGB), the surface driver is mono/rgb — otherwise fall through
            # to the plain (uncompacted) PRB pipeline below
            if hasattr(scene.integrator, "regen_backward") and (
                volfam or (scene.n_channels != 4 and not scene.polarized)
            ):
                return _render_regen_prb(
                    scene, jnp.uint32(seed), seed_grad, spp, sensor
                )
        elif supported:
            return _render_regen(scene, jnp.uint32(seed), spp, sensor)

    use_prb = getattr(scene.integrator, "is_prb", False)
    if spp_grad is not None and spp_grad != spp:
        # reference: the spp_grad argument of mi.render (util.py:551-560) —
        # an independent sample budget for the backward pass
        if not use_prb:
            raise ValueError("spp_grad needs a PRB integrator (the tape "
                             "backward reuses the forward lanes)")
        if n_passes != 1:
            raise ValueError("spp_grad requires a single pass "
                             "(spp_per_pass >= spp)")
        if film.rfilter in ("mitchell", "catmullrom", "lanczos"):
            raise ValueError(
                "spp_grad is exact only for filter-importance-sampled "
                f"films (box/tent/gaussian), not {film.rfilter!r}"
            )
    import time as _time

    t_start = _time.monotonic()
    acc = None
    spp_done = 0
    for p in range(n_passes):
        if p > 0:
            # pass-boundary stop checks; pass 0 always runs so a result exists
            if cancel is not None and cancel.cancelled:
                break
            if timeout is not None and _time.monotonic() - t_start > timeout:
                break
        this_spp = min(spp_per_pass, spp - p * spp_per_pass)
        aux = {}
        if use_prb:
            # PRB custom-vjp boundary (reference: _RenderOp, util.py:356-408);
            # spectral contraction + sensor Stokes rotation happen inside it
            L = _prb_pass_jit(
                scene, jnp.uint32(seed), seed_grad, p * spp_per_pass, this_spp,
                spp, sensor, spp_grad=spp_grad,
            )
            wavelengths = wl_pdf = None
        else:
            L, wavelengths, wl_pdf, aux = _render_pass(
                scene, jnp.uint32(seed), p * spp_per_pass, this_spp, spp, sensor
            )
        if scene.n_channels == 4 and wavelengths is not None and not scene.polarized:
            if film.srfs:
                # specfilm: per-channel sensor-response contraction over the
                # hero wavelengths (reference: src/films/specfilm.cpp)
                uv0 = jnp.zeros((L.shape[0], 2), jnp.float32)
                inv_pdf = 1.0 / jnp.maximum(jax.lax.stop_gradient(wl_pdf), 1e-12)
                L = jnp.stack(
                    [
                        jnp.mean(srf.eval(uv0, wavelengths, 4) * L * inv_pdf, -1)
                        / norm
                        for srf, norm in zip(film.srfs, film.srf_norms)
                    ],
                    axis=-1,
                )
            else:
                # spectral -> XYZ -> linear sRGB per lane (polarized variants
                # keep raw I/Q/U/V[.lambda], reference: integrator.cpp:1189)
                xyz = spec.spectrum_to_xyz(L, wavelengths, jax.lax.stop_gradient(wl_pdf))
                L = jnp.clip(spec.xyz_to_srgb(xyz), 0.0, None)
        img = develop(film, L, this_spp, jitter=aux.get("film_jitter"))
        acc = img * this_spp if acc is None else acc + img * this_spp
        spp_done += this_spp
        if (timeout is not None or cancel is not None) and not isinstance(
            acc, jax.core.Tracer
        ):
            # timed renders must observe real completion, not dispatch time
            acc.block_until_ready()
    return acc / spp_done


def render_progressive(scene, sensor=0, seed=0, spp=None, spp_per_pass=None):
    """Generator over multi-pass rendering: yields (spp_done, partial_image)
    after every pass, the partial image being the current unbiased estimate.

    TPU-native analog of the reference CLI's progressive behavior — the
    SIGHUP handler develops and writes the partially rendered film
    (reference: src/mitsuba/mitsuba.cpp:142-150) and Integrator::render's
    per-pass block accumulation (integrator.cpp:277-358).  Integrator
    families with single-launch drivers (ptracer/projective/regenerative)
    yield once with the full image."""
    spp = spp or scene.spp
    spp_per_pass = min(spp_per_pass or max(1, spp // 8), spp)
    single_shot = (
        getattr(scene.integrator, "is_ptracer", False)
        or getattr(scene.integrator, "is_projective", False)
        or getattr(scene.integrator, "regenerate", False)
    )
    if single_shot:
        yield spp, render(scene, sensor=sensor, seed=seed, spp=spp)
        return
    film = scene.film
    use_prb = getattr(scene.integrator, "is_prb", False)
    acc = None
    done = 0
    while done < spp:
        this_spp = min(spp_per_pass, spp - done)
        aux = {}
        if use_prb:
            from .ad.render_ad import derive_seed_grad

            L = _prb_pass_jit(
                scene, jnp.uint32(seed), derive_seed_grad(seed), done, this_spp,
                spp, sensor,
            )
            wavelengths = wl_pdf = None
        else:
            L, wavelengths, wl_pdf, aux = _render_pass(
                scene, jnp.uint32(seed), done, this_spp, spp, sensor
            )
        if scene.n_channels == 4 and wavelengths is not None and not scene.polarized:
            if film.srfs:
                uv0 = jnp.zeros((L.shape[0], 2), jnp.float32)
                inv_pdf = 1.0 / jnp.maximum(jax.lax.stop_gradient(wl_pdf), 1e-12)
                L = jnp.stack(
                    [
                        jnp.mean(srf.eval(uv0, wavelengths, 4) * L * inv_pdf, -1)
                        / norm
                        for srf, norm in zip(film.srfs, film.srf_norms)
                    ],
                    axis=-1,
                )
            else:
                xyz = spec.spectrum_to_xyz(L, wavelengths, jax.lax.stop_gradient(wl_pdf))
                L = jnp.clip(spec.xyz_to_srgb(xyz), 0.0, None)
        img = develop(film, L, this_spp, jitter=aux.get("film_jitter"))
        acc = img * this_spp if acc is None else acc + img * this_spp
        done += this_spp
        yield done, acc / done


@partial(jax.jit, static_argnames=("spp", "sensor_idx"))
def _render_regen_pass(scene, seed, spp, sensor_idx):
    scene = scene.replace(geometry=scene.geometry.refresh())
    L_px, aux = scene.integrator.regen_render(scene, seed, spp, sensor_idx)
    from .utils.observe import warn_invalid

    L_px, inv = warn_invalid(
        L_px, polarized=scene.polarized and L_px.ndim == 3
    )
    return L_px, dict(aux, **inv)


def _render_regen(scene, seed, spp, sensor_idx):
    """Regenerative wavefront render (path_regen_render docstring): one lane
    per pixel, samples summed in-loop; behaves like a single box/FIS pass."""
    film = scene.film
    L_px, aux = _render_regen_pass(scene, seed, spp, sensor_idx)
    return develop(film, L_px, 1) / float(spp)


@partial(jax.jit, static_argnames=("spp", "sensor_idx"))
def _render_regen_prb(scene, seed, seed_grad, spp, sensor_idx):
    """Differentiable regenerative render: the PRB custom-vjp boundary sits
    at the per-pixel sample sum (ad/render_ad.py prb_regen_px)."""
    from .ad.render_ad import prb_regen_px

    scene = scene.replace(geometry=scene.geometry.refresh())
    L_px = prb_regen_px(scene, seed, seed_grad, spp, sensor_idx)
    return develop(scene.film, L_px, 1) / float(spp)


@partial(jax.jit, static_argnames=("spp", "sensor_idx"))
def _ptracer_pass(scene, seed, spp, sensor_idx):
    film = scene.film
    n = film.width * film.height * spp
    rng = RNG(seed, jnp.arange(n, dtype=jnp.uint32))
    wavelengths = None  # ptracer: rgb/mono paths
    acc = scene.integrator.trace_particles(scene, rng, n, wavelengths, sensor_idx)
    # each particle contributes an unbiased per-pixel measurement sample
    return (acc / n).reshape(film.height, film.width, -1)  # ptracer splats full film (no crop)


def _render_ptracer(scene, seed, spp, sensor_idx):
    """Adjoint particle tracing render: N = W*H*spp particles splatted
    (reference: AdjointIntegrator::render, integrator.cpp:1304+)."""
    return _ptracer_pass(scene, jnp.uint32(seed), spp, sensor_idx)


def _prb_pass_jit(scene, seed, seed_grad, pass_base, spp_pass, spp_total, sensor_idx,
                  raw=False, spp_grad=None):
    from .ad.render_ad import prb_pass

    return jax.jit(prb_pass, static_argnums=(3, 4, 5, 6, 7, 8))(
        scene, seed, seed_grad, pass_base, spp_pass, spp_total, sensor_idx, raw,
        spp_grad,
    )


def render_1(scene, params=None, sensor=0, seed=0, spp=None):
    """Radiometer render: average *all* film samples into one spectrum
    (fork addition; reference: mi.render_1, common.py:113-196 — '[4 Stokes] x
    [N wavelengths]' point measurement).  Unpolarized variants return [C];
    polarized return [S, C] Stokes."""
    if params is not None and hasattr(params, "scene"):
        scene = params.scene
    spp = spp or scene.spp
    if getattr(scene.integrator, "is_prb", False):
        from .ad.render_ad import derive_seed_grad

        # raw=True: render_1 returns the raw wavelength channels (a Spectrum,
        # reference common.py:113-196), not the sRGB-contracted image values
        L = _prb_pass_jit(
            scene, jnp.uint32(seed), derive_seed_grad(seed), 0, spp, spp, sensor,
            raw=True,
        )
    else:
        L, wavelengths, wl_pdf, _ = _render_pass(scene, jnp.uint32(seed), 0, spp, spp, sensor)
    if scene.polarized:
        # L is [N, C, 4] Stokes in polarized integrators
        return jnp.mean(L, axis=0).T  # [4, C] -> Stokes-major
    return jnp.mean(L, axis=0)


def render_test(scene, params=None, sensor=0, seed=0, spp=None, sensor_count=1):
    """Multi-view batch render: split a wide film into sensor_count sub-views
    of width film.height and average each (fork addition; reference:
    mi.render_test, common.py:198-302).  Unpolarized variants return
    [sensor_count, C]; polarized return [sensor_count, 4, C] Stokes —
    matching render_1's per-view semantics."""
    if params is not None and hasattr(params, "scene"):
        scene = params.scene
    film = scene.film
    spp = spp or scene.spp
    if getattr(scene.integrator, "is_prb", False):
        from .ad.render_ad import derive_seed_grad

        L = _prb_pass_jit(
            scene, jnp.uint32(seed), derive_seed_grad(seed), 0, spp, spp, sensor,
            raw=True,
        )
    else:
        L, wavelengths, wl_pdf, _ = _render_pass(scene, jnp.uint32(seed), 0, spp, spp, sensor)
    sub_w = film.width // sensor_count
    from .render.film import to_pixel_major

    L = to_pixel_major(film, L, spp)
    if scene.polarized:
        c = L.shape[-2]
        img = L.reshape(film.height, sensor_count, sub_w, spp, c, 4)
        out = jnp.mean(img, axis=(0, 2, 3))            # [sensor_count, C, 4]
        return jnp.swapaxes(out, -1, -2)               # [sensor_count, 4, C]
    c = L.shape[-1]
    img = L.reshape(film.height, sensor_count, sub_w, spp, c)
    return jnp.mean(img, axis=(0, 2, 3))  # [sensor_count, C]


def scene_tangent(scene, key, tangent_value=None):
    """Zero tangent pytree for `scene` with the parameter at `key` set to
    `tangent_value` (default: ones) — input for render_forward."""
    import numpy as np
    from .render.params import _tree_get, _tree_set

    path = dict(scene.param_paths)[key]
    base = _tree_get(scene, path)

    def zero_like(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        if hasattr(x, "dtype"):
            return np.zeros(x.shape, jax.dtypes.float0)
        return np.zeros((), jax.dtypes.float0) if isinstance(x, (int,)) else 0.0

    zt = jax.tree_util.tree_map(zero_like, scene)
    t = jnp.ones_like(base) if tangent_value is None else jnp.broadcast_to(
        jnp.asarray(tangent_value, jnp.float32), base.shape
    )
    return _tree_set(zt, path, t)


def render_forward(scene, tangent=None, key=None, sensor=0, seed=0, spp=None):
    """Forward-mode differential rendering: dimage/dtheta . tangent
    (reference: Integrator::render_forward, integrator.h:37-381 /
    ADIntegrator.render_forward, common.py — there driven by dr.ADMode.Forward).

    Pass either a full scene-tangent pytree (`tangent`) or a parameter name
    (`key`, tangent = ones).  Uses jax.jvp through the tape-differentiable
    scan integrators (path/volpath families).  PRB integrators define only a
    custom VJP (reverse replay) and raise here, matching the reference's
    'PRBPolarizedIntegrator doesn't support forward-mode differentiation'
    (prb_polarized.py:107-109)."""
    if getattr(scene.integrator, "is_prb", False):
        raise NotImplementedError(
            "render_forward requires a tape-differentiable integrator "
            "(path/volpath); PRB integrators implement the reverse replay only"
        )
    if tangent is None:
        if key is None:
            raise ValueError("render_forward needs `tangent` or `key`")
        tangent = scene_tangent(scene, key)
    _, dimg = jax.jvp(
        lambda s: render(s, sensor=sensor, seed=seed, spp=spp), (scene,), (tangent,)
    )
    return dimg
