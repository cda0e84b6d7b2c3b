"""Mueller/Stokes calculus (reference: include/mitsuba/render/mueller.h, 472 LoC).

Conventions mirrored from the reference exactly:
  * A Stokes vector is meaningful only with its basis vector, orthogonal to
    the propagation direction; the polarization ellipse is observed from the
    sensor side, looking back along the beam (mueller.h:17-25).
  * stokes_basis(forward) = coordinate_system(forward)[0] (mueller.h:348).
  * rotator(theta) rotates the reference frame counter-clockwise when facing
    the beam (mueller.h:150-170).

Array conventions: Stokes [..., 4], Mueller [..., 4, 4]; all generators
broadcast over leading wavefront/channel axes.  `matmul` of Muellers composes
right-to-left like the reference's `M2 * M1`.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.frame import coordinate_system, cross, dot, normalize
from .fresnel import fresnel_polarized


def _mm(rows):
    """Stack a 4x4 of (broadcastable) scalars into [..., 4, 4]."""
    return jnp.stack([jnp.stack(jnp.broadcast_arrays(*r), axis=-1) for r in rows], axis=-2)


def depolarizer(value=1.0):
    """[..., 4, 4] with only (0,0) = value (mueller.h:37-42)."""
    value = jnp.asarray(value, jnp.float32)
    z = jnp.zeros_like(value)
    o = value
    return _mm([[o, z, z, z], [z, z, z, z], [z, z, z, z], [z, z, z, z]])


def absorber(value):
    return jnp.asarray(value)[..., None, None] * jnp.eye(4, dtype=jnp.float32)


def linear_polarizer(value=1.0):
    value = jnp.asarray(value, jnp.float32)
    a = value * 0.5
    z = jnp.zeros_like(a)
    return _mm([[a, a, z, z], [a, a, z, z], [z, z, z, z], [z, z, z, z]])


def linear_retarder(phase):
    phase = jnp.asarray(phase, jnp.float32)
    s, c = jnp.sin(phase), jnp.cos(phase)
    o = jnp.ones_like(s)
    z = jnp.zeros_like(s)
    return _mm([[o, z, z, z], [z, o, z, z], [z, z, c, s], [z, z, -s, c]])


def right_circular_polarizer():
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(0.5).at[0, 3].set(0.5).at[3, 0].set(0.5).at[3, 3].set(0.5)
    return m


def left_circular_polarizer():
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(0.5).at[0, 3].set(-0.5).at[3, 0].set(-0.5).at[3, 3].set(0.5)
    return m


def diattenuator(x, y):
    x, y = jnp.broadcast_arrays(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    a = 0.5 * (x + y)
    b = 0.5 * (x - y)
    c = jnp.sqrt(jnp.maximum(x * y, 0.0))
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z], [b, a, z, z], [z, z, c, z], [z, z, z, c]])


def rotator(theta):
    """Frame rotator (mueller.h:150-170): rotates the Stokes reference frame
    counter-clockwise by theta (sensor-side view)."""
    theta = jnp.asarray(theta, jnp.float32)
    s, c = jnp.sin(2.0 * theta), jnp.cos(2.0 * theta)
    o = jnp.ones_like(s)
    z = jnp.zeros_like(s)
    return _mm([[o, z, z, z], [z, c, s, z], [z, -s, c, z], [z, z, z, o]])


def rotated_element(theta, M):
    """Rt * M * R (mueller.h:178-184)."""
    R = rotator(theta)
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt @ M @ R


def specular_reflection(cos_theta_i, eta):
    """Mueller matrix of specular reflection at a (possibly complex-eta)
    interface (mueller.h:199-225)."""
    a_s, a_p, _, _, _ = fresnel_polarized(cos_theta_i, eta)

    # phase delay delta = arg(a_p) - arg(a_s), via sincos of the arg difference
    prod = a_p * jnp.conj(a_s)
    mag = jnp.abs(prod)
    cos_delta = jnp.where(mag > 0, jnp.real(prod) / jnp.maximum(mag, 1e-20), 0.0)
    sin_delta = jnp.where(mag > 0, jnp.imag(prod) / jnp.maximum(mag, 1e-20), 0.0)

    r_s = jnp.abs(a_s) ** 2
    r_p = jnp.abs(a_p) ** 2
    a = 0.5 * (r_s + r_p)
    b = 0.5 * (r_s - r_p)
    c = jnp.sqrt(jnp.maximum(r_s * r_p, 0.0))
    sin_delta = jnp.where(c == 0.0, 0.0, sin_delta)
    cos_delta = jnp.where(c == 0.0, 0.0, cos_delta)
    z = jnp.zeros_like(a)
    return _mm(
        [
            [a, b, z, z],
            [b, a, z, z],
            [z, z, c * cos_delta, -c * sin_delta],
            [z, z, c * sin_delta, c * cos_delta],
        ]
    )


def specular_transmission(cos_theta_i, eta):
    """Mueller matrix of specular transmission through a real dielectric
    interface (mueller.h:227-266); includes the radiance unit-conversion
    factor -eta_it * cos_theta_t / cos_theta_i."""
    a_s, a_p, cos_theta_t, eta_it, eta_ti = fresnel_polarized(cos_theta_i, eta)
    eta_it_r = jnp.real(eta_it)
    eta_ti_r = jnp.real(eta_ti)

    factor = -eta_it_r * jnp.where(
        jnp.abs(cos_theta_i) > 1e-8, cos_theta_t / jnp.where(jnp.abs(cos_theta_i) > 1e-8, cos_theta_i, 1.0), 0.0
    )

    a_s_r = 1.0 + jnp.real(a_s)
    a_p_r = (1.0 + jnp.real(a_p)) * eta_ti_r

    t_s = a_s_r * a_s_r
    t_p = a_p_r * a_p_r
    a = 0.5 * factor * (t_s + t_p)
    b = 0.5 * factor * (t_s - t_p)
    c = factor * jnp.sqrt(jnp.maximum(t_s * t_p, 0.0))
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z], [b, a, z, z], [z, z, c, z], [z, z, z, c]])


def mie_scatter(s1, s2, ns):
    """Mueller matrix from complex Mie amplitudes S1 (ordinary) / S2
    (extraordinary), normalized by ns (fork addition, mueller.h:282-295)."""
    n1 = jnp.real(s1) ** 2 + jnp.imag(s1) ** 2
    n2 = jnp.real(s2) ** 2 + jnp.imag(s2) ** 2
    s11 = 0.5 * (n1 + n2)
    s12 = 0.5 * (n1 - n2)
    prod = s1 * jnp.conj(s2)
    s33 = jnp.real(prod)
    s34 = jnp.imag(prod)
    z = jnp.zeros_like(s11)
    m = _mm([[s11, s12, z, z], [s12, s11, z, z], [z, z, s33, s34], [z, z, -s34, s33]])
    return m / jnp.asarray(ns)[..., None, None]


def rayleigh_scatter(cos_theta, sin_theta, rho):
    """Polarized Rayleigh Mueller matrix with depolarization factor rho
    (fork addition, mueller.h:311-328)."""
    rho = jnp.asarray(rho, jnp.float32)
    r1 = (1.0 - rho) / (1.0 + rho / 2.0)
    r2 = (1.0 + rho) / (1.0 - rho)
    r3 = (1.0 - 2.0 * rho) / (1.0 - rho)

    a = r2 + cos_theta * cos_theta
    b = 1.0 + cos_theta * cos_theta
    c = -(sin_theta * sin_theta)
    d = 2.0 * cos_theta
    z = jnp.zeros_like(a)
    pref = (3.0 / (16.0 * jnp.pi)) * r1
    m = _mm([[a, c, z, z], [c, b, z, z], [z, z, d, z], [z, z, z, d * r3]])
    return pref[..., None, None] * m if jnp.ndim(pref) else pref * m


def stokes_basis(forward):
    """Implicit reference basis of a Stokes vector traveling along `forward`
    (mueller.h:344-351)."""
    return coordinate_system(forward)[0]


def unit_angle(a, b):
    """Numerically stable angle between unit vectors (drjit sphere.h).
    Kept for API parity/tests; rotate_stokes_basis no longer routes through
    it (its arcsin has an infinite derivative at the clip boundary)."""
    dot_ab = dot(a, b)
    d = jnp.sqrt(jnp.sum((b - a) ** 2, axis=-1))
    s = jnp.sqrt(jnp.sum((b + a) ** 2, axis=-1))
    return jnp.where(dot_ab >= 0, 2.0 * jnp.arcsin(jnp.clip(0.5 * d, -1.0, 1.0)),
                     jnp.pi - 2.0 * jnp.arcsin(jnp.clip(0.5 * s, -1.0, 1.0)))


def rotate_stokes_basis(forward, basis_current, basis_target):
    """Mueller matrix realigning two collinear Stokes bases (mueller.h:353-401).

    Built directly from (cos 2theta, sin 2theta) via dot/cross products —
    algebraically identical to rotator(unit_angle(...)) but with a finite
    derivative everywhere: the angle form's arcsin has an INFINITE gradient
    at exactly (anti)parallel bases, which poisoned reverse-mode geometry
    gradients through the Mueller rotations (r5 polarized-projective NaN)."""
    a = normalize(basis_current)
    b = normalize(basis_target)
    c = dot(a, b)                          # cos theta
    s = dot(forward, cross(a, b))          # sin theta, signed about forward
    c2 = c * c - s * s                     # cos 2theta
    s2 = 2.0 * s * c                       # sin 2theta
    o = jnp.ones_like(c2)
    z = jnp.zeros_like(c2)
    return _mm([[o, z, z, z], [z, c2, s2, z], [z, -s2, c2, z], [z, z, z, o]])


def rotate_mueller_basis(
    M, in_forward, in_basis_current, in_basis_target, out_forward, out_basis_current, out_basis_target
):
    """Re-express M in new input/output Stokes bases: R_out * M * R_in^T
    (mueller.h:424-452)."""
    R_in = rotate_stokes_basis(in_forward, in_basis_current, in_basis_target)
    R_out = rotate_stokes_basis(out_forward, out_basis_current, out_basis_target)
    return R_out @ M @ jnp.swapaxes(R_in, -1, -2)


def rotate_mueller_basis_collinear(M, forward, basis_current, basis_target):
    """Same rotation applied to both sides: R * M * R^T (mueller.h:454-467)."""
    R = rotate_stokes_basis(forward, basis_current, basis_target)
    return R @ M @ jnp.swapaxes(R, -1, -2)


def to_world_mueller(M, in_forward_local, out_forward_local, to_world3):
    """Rotate a local-frame Mueller matrix into world-frame implicit bases.

    Mirrors SurfaceInteraction::to_world_mueller exactly
    (reference: include/mitsuba/render/interaction.h:374-415): M operates from
    stokes_basis(in_forward_local) to stokes_basis(out_forward_local), both
    given along the *propagation direction of light* in the local frame; the
    result operates between the implicit world bases of the same directions.

    to_world3: [..., 3, 3] rotation (frame s/t/n as columns).  M may carry a
    channel axis: [..., C, 4, 4] with the direction batch dims leading."""
    def tw(v):
        return jnp.einsum("...ij,...j->...i", to_world3, v)

    in_fwd_w = tw(in_forward_local)
    out_fwd_w = tw(out_forward_local)
    in_basis_cur = tw(stokes_basis(in_forward_local))
    out_basis_cur = tw(stokes_basis(out_forward_local))
    in_basis_tgt = stokes_basis(in_fwd_w)
    out_basis_tgt = stokes_basis(out_fwd_w)
    R_in = rotate_stokes_basis(in_fwd_w, in_basis_cur, in_basis_tgt)
    R_out = rotate_stokes_basis(out_fwd_w, out_basis_cur, out_basis_tgt)
    # insert the channel axis of M: rotations depend only on directions
    if M.ndim == R_in.ndim + 1:
        R_in = R_in[..., None, :, :]
        R_out = R_out[..., None, :, :]
    return R_out @ M @ jnp.swapaxes(R_in, -1, -2)


def circular_polarizer(value=1.0, left=False):
    """Ideal circular polarizer Mueller matrix transmitting right- (or left-)
    circularly polarized light (reference: mueller.h right/left_circular_polarizer;
    src/bsdfs/circular.cpp)."""
    s = -1.0 if left else 1.0
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(0.5).at[0, 3].set(0.5 * s)
    m = m.at[3, 0].set(0.5 * s).at[3, 3].set(0.5)
    return m * value
