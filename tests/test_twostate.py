"""Two-state medium API for recursive control variates (the fork's
medium.h:68-102 / medium.cpp:91-122 hooks)."""
import numpy as np
import jax.numpy as jnp

import mitsuba_tpu as mi
from mitsuba_tpu.render.media import (
    HomogeneousMedium, TwoStateMedium, transmittance_eval_pdf,
)
from mitsuba_tpu.render.volumes import ConstVolume


def _medium(sigma):
    return HomogeneousMedium(
        sigma_t=ConstVolume(value=jnp.asarray(sigma, jnp.float32)),
        albedo=ConstVolume(value=jnp.asarray([0.8, 0.8, 0.8], jnp.float32)),
        scale=jnp.asarray(1.0, jnp.float32),
        phase_index=0,
    )


def test_transmittance_eval_pdf():
    """Scattered lanes get pdf = Tr * sigma_t; escaped lanes get pdf = Tr
    (medium.cpp:101-111)."""
    st = jnp.asarray([[0.5, 1.0, 2.0]], jnp.float32)
    mi_t = jnp.asarray([1.2], jnp.float32)
    si_t = jnp.asarray([2.0], jnp.float32)  # scattered (mi_t < si_t)
    tr, pdf = transmittance_eval_pdf(mi_t, si_t, jnp.zeros(1), st)
    np.testing.assert_allclose(np.asarray(tr), np.exp(-1.2 * np.asarray(st)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(tr * st), rtol=1e-6)
    si_t2 = jnp.asarray([0.7], jnp.float32)  # escaped (si_t < mi_t)
    tr2, pdf2 = transmittance_eval_pdf(mi_t, si_t2, jnp.zeros(1), st)
    np.testing.assert_allclose(np.asarray(tr2), np.exp(-0.7 * np.asarray(st)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf2), np.asarray(tr2), rtol=1e-6)


def test_twostate_default_passthrough():
    """wrap(m) == reference default: old state answers match current."""
    m = TwoStateMedium.wrap(_medium([1.0, 2.0, 3.0]))
    p = jnp.zeros((4, 3))
    ss, sn, st = m.get_scattering_coefficients(p, 3)
    ss_o, sn_o, st_o = m.get_scattering_coefficients_old(p, 3)
    np.testing.assert_array_equal(np.asarray(st), np.asarray(st_o))
    mi_t = jnp.full((4,), 0.5)
    si_t = jnp.full((4,), 1.0)
    tr, pdf = m.transmittance_eval_pdf(mi_t, si_t, jnp.zeros(4), p, 3)
    tr_o, pdf_o = m.transmittance_eval_pdf_old(mi_t, si_t, jnp.zeros(4), p, 3)
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(tr_o))
    np.testing.assert_array_equal(np.asarray(pdf), np.asarray(pdf_o))


def test_twostate_control_variate_states_differ():
    """With a genuinely old state attached, *_old evaluates it — the
    correlated pair a recursive control variate needs."""
    cur, old = _medium([2.0, 2.0, 2.0]), _medium([1.0, 1.0, 1.0])
    m = TwoStateMedium.wrap(cur, old=old)
    p = jnp.zeros((2, 3))
    mi_t = jnp.full((2,), 1.0)
    si_t = jnp.full((2,), 2.0)
    tr, _ = m.transmittance_eval_pdf(mi_t, si_t, jnp.zeros(2), p, 3)
    tr_o, _ = m.transmittance_eval_pdf_old(mi_t, si_t, jnp.zeros(2), p, 3)
    np.testing.assert_allclose(np.asarray(tr), np.exp(-2.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tr_o), np.exp(-1.0), rtol=1e-6)
    # delegation surface stays on the current state
    np.testing.assert_allclose(
        np.asarray(m.get_majorant(p, 3)), 2.0, rtol=1e-6
    )
    assert m.is_homogeneous and m.phase_index == 0


def test_twostate_is_jittable_pytree():
    """TwoStateMedium must trace as a pytree (both states are leaves)."""
    import jax

    m = TwoStateMedium.wrap(_medium([1.5, 1.5, 1.5]), old=_medium([1.0, 1.0, 1.0]))

    @jax.jit
    def f(m, p):
        tr, _ = m.transmittance_eval_pdf(
            jnp.ones(p.shape[0]), 2.0 * jnp.ones(p.shape[0]),
            jnp.zeros(p.shape[0]), p, 3,
        )
        tr_o, _ = m.transmittance_eval_pdf_old(
            jnp.ones(p.shape[0]), 2.0 * jnp.ones(p.shape[0]),
            jnp.zeros(p.shape[0]), p, 3,
        )
        return tr - tr_o

    out = f(m, jnp.zeros((3, 3)))
    np.testing.assert_allclose(
        np.asarray(out), np.exp(-1.5) - np.exp(-1.0), rtol=1e-6
    )
