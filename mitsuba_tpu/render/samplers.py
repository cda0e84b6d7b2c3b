"""Sample generators (reference: src/samplers/{independent,stratified,
multijitter,orthogonal,ldsampler}.cpp).

The independent sampler is the counter-based RNG stream (core/rng.py).  The
stratified family works differently here than in the reference: because film
samples are pixel-major lanes with a known samples-per-pixel count, we produce
stratified/low-discrepancy points *per pixel* by combining the lane's
sample-within-pixel index with scrambling from the lane RNG — stateless and
replay-stable, no per-thread sampler objects needed.

These generators drive the film-plane jitter dimension.  The *path*
dimensions are covered too, by the RNG stream modes in core/rng.py: with
``lds=True`` every dimension the path consumes comes from an Owen-scrambled
(0,2)-sequence (ldsampler/sobol) or a Bose strength-2 orthogonal array
(orthogonal), keyed by (pixel, sample index, dimension counter) so PRB
replay stays bitwise identical (see core/rng.py:14-22 and
tests/test_samplers_lds.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.rng import threefry2x32, uniform_from_bits


def stratified_2d(sample_idx, spp, u_scramble):
    """Stratified jittered 2D point for sample `sample_idx` of `spp`
    (reference: src/samplers/stratified.cpp).  Grid is ceil(sqrt(spp))^2;
    u_scramble: [N, 2] uniform jitter within the stratum."""
    import numpy as np

    res = int(np.ceil(np.sqrt(spp)))
    sx = (sample_idx % res).astype(jnp.float32)
    sy = ((sample_idx // res) % res).astype(jnp.float32)
    x = (sx + u_scramble[..., 0]) / res
    y = (sy + u_scramble[..., 1]) / res
    return jnp.stack([x, y], axis=-1)


def multijitter_2d(sample_idx, spp, lane, seed):
    """Correlated multi-jittered points (Kensler 2013)
    (reference: src/samplers/multijitter.cpp).  Stratified in both the grid
    and the 1D projections, with per-pixel scrambling."""
    import numpy as np

    res = int(np.ceil(np.sqrt(spp)))
    n = res * res
    s = sample_idx % n
    # per-pixel permutation seeds from the lane's pixel id
    b0, b1 = threefry2x32(seed, jnp.uint32(0x51723), lane, jnp.uint32(0))
    sx = _permute(s % res, res, b0)
    sy = _permute(s // res, res, b1)
    jx = uniform_from_bits(threefry2x32(seed, jnp.uint32(0x9acb3), lane, s)[0])
    jy = uniform_from_bits(threefry2x32(seed, jnp.uint32(0x41f0d), lane, s)[1])
    x = (s % res + (sy + jx) / res) / res
    y = (s // res + (sx + jy) / res) / res
    return jnp.stack([x, y], axis=-1)


def _permute(i, l, p):
    """Stateless pseudorandom permutation of [0, l) (Kensler's hash permute,
    simplified power-of-two cycle walking)."""
    w = 1
    while w < l:
        w <<= 1
    w = jnp.uint32(w - 1)
    i = i.astype(jnp.uint32)
    p = p.astype(jnp.uint32)

    def mix(i):
        i ^= p
        i = i * jnp.uint32(0xE170893D)
        i ^= p >> jnp.uint32(16)
        i ^= (i & w) >> jnp.uint32(4)
        i ^= p >> jnp.uint32(8)
        i = i * jnp.uint32(0x0929EB3F)
        i ^= p >> jnp.uint32(23)
        i = i * jnp.uint32(1 | (p >> jnp.uint32(27)))
        return i & w

    # cycle-walk until inside [0, l)
    i = mix(i)
    i = jnp.where(i >= l, mix(i), i)
    i = jnp.where(i >= l, mix(i), i)
    i = jnp.where(i >= l, mix(i), i)
    return jnp.minimum(i, jnp.uint32(l - 1)).astype(jnp.float32)


def radical_inverse_2(i):
    """Van der Corput base 2 via bit reversal (reference: qmc.h)."""
    i = i.astype(jnp.uint32)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    i = (i << 16) | (i >> 16)
    return i.astype(jnp.float32) * (1.0 / 4294967296.0)


def sobol_2d(sample_idx, lane, seed):
    """(0,2)-sequence point: (van der Corput, Sobol' dim-2) with Owen-style
    per-pixel xor scrambling (reference: src/samplers/ldsampler.cpp)."""
    i = sample_idx.astype(jnp.uint32)
    x = radical_inverse_2(i)
    # Sobol' second dimension via the classic direction numbers
    v = jnp.uint32(1 << 31)
    y_bits = jnp.zeros_like(i)
    idx = i

    def body(k, carry):
        y_bits, idx, v = carry
        y_bits = jnp.where((idx & 1) == 1, y_bits ^ v, y_bits)
        idx = idx >> 1
        v = v ^ (v >> 1)
        return (y_bits, idx, v)

    import jax

    y_bits, _, _ = jax.lax.fori_loop(0, 32, body, (y_bits, idx, jnp.broadcast_to(v, i.shape)))
    # xor-scramble both dims per pixel
    s0, s1 = threefry2x32(seed, jnp.uint32(0x50B01), lane, jnp.uint32(1))
    xb = (x * 4294967296.0).astype(jnp.uint32) ^ s0
    yb = y_bits ^ s1
    return jnp.stack(
        [xb.astype(jnp.float32) / 4294967296.0, yb.astype(jnp.float32) / 4294967296.0],
        axis=-1,
    )
