"""Chi-square distribution tests across warps, phases, BSDFs, microfacets
(mirrors reference test strategy: src/core/tests/test_warp.py,
src/phase/tests/test_hg.py, src/bsdfs/tests/*)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.chi2 import (
    BSDFAdapter,
    ChiSquareTest,
    MicrofacetAdapter,
    PhaseFunctionAdapter,
    WarpAdapter,
)
from mitsuba_tpu.core import warp
from mitsuba_tpu.render import phase as PH
from mitsuba_tpu.render.bsdfs import DiffuseBSDF, RoughConductorBSDF, RoughDielectricBSDF
from mitsuba_tpu.render.textures import ConstantTexture

N = 400_000
WI = [0.3, -0.25, np.sqrt(1 - 0.09 - 0.0625)]


def _run(sample_func, pdf_func, seed=11):
    t = ChiSquareTest(sample_func, pdf_func, sample_count=N, seed=seed)
    ok = t.run()
    assert ok, t.messages


@pytest.mark.parametrize(
    "wfn,pfn",
    [
        (warp.square_to_uniform_sphere, warp.square_to_uniform_sphere_pdf),
        (warp.square_to_cosine_hemisphere, warp.square_to_cosine_hemisphere_pdf),
        (warp.square_to_rayleigh, warp.square_to_rayleigh_pdf),
    ],
)
def test_warp_chi2(wfn, pfn):
    _run(*WarpAdapter(wfn, pfn))


@pytest.mark.parametrize("g", [-0.6, 0.0, 0.8])
def test_hg_chi2(g):
    ph = PH.HGPhase(g=jnp.asarray(g, jnp.float32))
    _run(*PhaseFunctionAdapter(ph))


def test_tabphase_chi2():
    nodes = jnp.linspace(-1, 1, 33)
    values = jnp.asarray(1.0 + 0.8 * np.cos(np.asarray(nodes) * 2.2), jnp.float32)
    ph = PH.TabulatedPhase(nodes=nodes, values=values)
    _run(*PhaseFunctionAdapter(ph))


def test_diffuse_chi2():
    b = DiffuseBSDF(reflectance=ConstantTexture(value=jnp.asarray([0.8])))
    _run(*BSDFAdapter(b, WI))


def test_roughconductor_chi2():
    b = RoughConductorBSDF(
        eta=jnp.asarray([0.2]), k=jnp.asarray([3.0]),
        alpha_u=jnp.asarray(0.3), alpha_v=jnp.asarray(0.3),
        specular_reflectance=ConstantTexture(value=jnp.asarray([1.0])),
    )
    _run(*BSDFAdapter(b, WI))


def test_roughdielectric_chi2():
    b = RoughDielectricBSDF(
        eta=jnp.asarray(1.5), alpha=jnp.asarray(0.35),
        specular_reflectance=ConstantTexture(value=jnp.asarray([1.0])),
        specular_transmittance=ConstantTexture(value=jnp.asarray([1.0])),
    )
    _run(*BSDFAdapter(b, WI))


def test_ggx_vndf_chi2():
    _run(*MicrofacetAdapter(jnp.asarray(0.4), WI))


def test_chi2_catches_wrong_pdf():
    """Sanity: the harness must FAIL when sample and pdf disagree."""
    t = ChiSquareTest(
        lambda u1, u2: warp.square_to_cosine_hemisphere(u2),
        warp.square_to_uniform_hemisphere_pdf,
        sample_count=N,
        seed=3,
    )
    assert not t.run(), t.messages


def test_spectrum_visible_chi2():
    """Wavelength importance sampling (reference chi2 SpectrumAdapter)."""
    from mitsuba_tpu.chi2 import ChiSquareTest1D, SpectrumAdapter

    s, p, lo, hi = SpectrumAdapter("visible")
    t = ChiSquareTest1D(s, p, lo, hi, sample_count=200_000, seed=11)
    assert t.run(), t.messages


def test_spectrum_uniform_chi2():
    from mitsuba_tpu.chi2 import ChiSquareTest1D, SpectrumAdapter

    s, p, lo, hi = SpectrumAdapter("uniform")
    t = ChiSquareTest1D(s, p, lo, hi, sample_count=100_000, seed=12)
    assert t.run(), t.messages


def test_emitter_nee_chi2_envmap():
    """Scene-level NEE sample/pdf chi2 (reference chi2 EmitterAdapter) on a
    smooth emitter: an envmap's importance-sampled directions must match the
    MIS pdf over the whole sphere.  (Area lights have a discontinuous
    solid-angle support that the cell quadrature cannot integrate reliably;
    they are covered by the exact lane-wise test below.)"""
    import numpy as np
    import mitsuba_tpu as mi
    from mitsuba_tpu.chi2 import ChiSquareTest, EmitterAdapter

    mi.set_variant("rgb")
    rng = np.random.default_rng(4)
    img = (0.2 + rng.uniform(0, 1, (16, 32, 3)) ** 2).astype(np.float32)
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path"},
        "env": {"type": "envmap", "data": img},
        "sensor": {
            "type": "perspective",
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
        },
    })
    s, p = EmitterAdapter(scene, [0.0, 0.0, 0.0])
    t = ChiSquareTest(s, p, sample_count=400_000, seed=13)
    assert t.run(), t.messages


def test_emitter_nee_pdf_consistency_area():
    """Exact lane-wise agreement between sample_emitter_direction's pdf and
    the MIS query pdf (pdf_emitter_direction_hit) for the cornell-box area
    light — the property the chi2 EmitterAdapter certifies, tested without
    the discontinuity-quadrature caveat."""
    import numpy as np
    import jax.numpy as jnp
    import mitsuba_tpu as mi
    from mitsuba_tpu.core.rng import RNG
    from mitsuba_tpu.render.records import Ray

    mi.set_variant("rgb")
    scene = mi.load_dict(mi.cornell_box())
    n = 50_000
    rng = RNG(5, np.arange(n, dtype=np.uint32))
    u1, _, rng = rng.next_2d()
    a, b, _ = rng.next_2d()
    ref = jnp.broadcast_to(jnp.asarray([0.1, -0.2, 0.3], jnp.float32), (n, 3))
    ds, _ = scene.sample_emitter_direction(
        ref, u1, jnp.stack([a, b], -1), None, jnp.ones((n,), bool),
        test_visibility=False,
    )
    si = scene.ray_intersect(Ray.make(ref, ds.d), jnp.ones((n,), bool))
    pdf_q = np.asarray(scene.pdf_emitter_direction_hit(ref, si))
    ds_pdf = np.asarray(ds.pdf)
    ok = ds_pdf > 0
    assert ok.mean() > 0.99
    rel = np.abs(pdf_q[ok] - ds_pdf[ok]) / np.maximum(ds_pdf[ok], 1e-9)
    assert rel.max() < 1e-4, rel.max()


def test_emitter_nee_chi2_constant():
    """Constant (uniform-sphere) environment emitter through the same
    scene-level adapter."""
    import mitsuba_tpu as mi
    from mitsuba_tpu.chi2 import ChiSquareTest, EmitterAdapter

    mi.set_variant("rgb")
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path"},
        "env": {"type": "constant", "radiance": {"type": "rgb", "value": [0.7, 0.8, 1.0]}},
        "sensor": {
            "type": "perspective",
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
        },
    })
    s, p = EmitterAdapter(scene, [0.0, 0.0, 0.0])
    t = ChiSquareTest(s, p, sample_count=200_000, seed=17)
    assert t.run(), t.messages


def test_emitter_nee_chi2_envmap_rotated():
    """Envmap with a to_world rotation: sampling and pdf must agree in the
    rotated frame too."""
    import numpy as np
    import mitsuba_tpu as mi
    from mitsuba_tpu.chi2 import ChiSquareTest, EmitterAdapter

    mi.set_variant("rgb")
    rng = np.random.default_rng(9)
    img = (0.1 + rng.uniform(0, 1, (12, 24, 3)) ** 2).astype(np.float32)
    scene = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path"},
        "env": {
            "type": "envmap", "data": img,
            "to_world": [{"type": "rotate", "axis": [0, 1, 0], "angle": 55.0},
                         {"type": "rotate", "axis": [1, 0, 0], "angle": 20.0}],
        },
        "sensor": {
            "type": "perspective",
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
        },
    })
    s, p = EmitterAdapter(scene, [0.0, 0.0, 0.0])
    t = ChiSquareTest(s, p, sample_count=400_000, seed=19)
    assert t.run(), t.messages
