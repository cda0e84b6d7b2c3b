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
