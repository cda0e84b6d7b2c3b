"""Quasi-Monte-Carlo point sets: radical inverse family
(reference: include/mitsuba/core/qmc.h, src/core/qmc.cpp).

The reference exposes RadicalInverse (Halton/Hammersley bases with optional
permutation scrambling) as a core utility.  TPU-native stance: digits are
peeled with a fixed-trip-count fori_loop (32 iterations covers uint32 in any
base >= 2), everything vectorized over index batches; per-base Faure-style
permutations are generated host-side once and applied with gathers on tiny
tables.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# first 32 primes — base table of the reference's RadicalInverse (qmc.h)
PRIMES = np.array(
    [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
     59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131],
    np.uint32,
)


def radical_inverse(base_index, index):
    """Radical inverse of `index` (uint32 array) in the prime base numbered
    `base_index` (static int).  Returns floats in [0, 1)
    (reference: qmc.h eval / radical_inverse_2)."""
    b = int(PRIMES[base_index])
    index = jnp.asarray(index, jnp.uint32)
    if b == 2:
        # bit reversal fast path (reference: math::sample_tea-style reversal)
        v = index
        v = ((v >> 1) & 0x55555555) | ((v & 0x55555555) << 1)
        v = ((v >> 2) & 0x33333333) | ((v & 0x33333333) << 2)
        v = ((v >> 4) & 0x0F0F0F0F) | ((v & 0x0F0F0F0F) << 4)
        v = ((v >> 8) & 0x00FF00FF) | ((v & 0x00FF00FF) << 8)
        v = (v >> 16) | (v << 16)
        return v.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)

    inv_b = 1.0 / b

    def body(_, st):
        n, result, factor = st
        digit = (n % b).astype(jnp.float32)
        return n // b, result + digit * factor, factor * inv_b

    n_iter = int(np.ceil(32 / np.log2(b)))
    _, result, _ = jax.lax.fori_loop(
        0, n_iter, body,
        (index, jnp.zeros(index.shape, jnp.float32),
         jnp.full(index.shape, inv_b, jnp.float32)),
    )
    return jnp.minimum(result, 1.0 - 1e-7)


def faure_permutation(b, seed=0):
    """Deterministic digit permutation for base b (host-side numpy):
    the classic Faure construction, optionally rotated by `seed`
    (reference: qmc.cpp permutation tables)."""
    if b == 2:
        perm = np.array([0, 1], np.uint32)
    else:
        perm = np.arange(b, dtype=np.uint32)
        rs = np.random.RandomState(seed * 7919 + b)
        # scrambled: random permutation fixing nothing special; Faure-style
        # deterministic alternative kept for seed=0
        if seed:
            rs.shuffle(perm[1:] if b > 2 else perm)
        else:
            # Faure: recursively built permutation
            perm = _faure(b).astype(np.uint32)
    return perm


def _faure(b):
    if b == 2:
        return np.array([0, 1])
    if b % 2 == 0:
        p = _faure(b // 2)
        return np.concatenate([2 * p, 2 * p + 1])
    c = (b - 1) // 2
    p = _faure(b - 1)
    p = np.where(p >= c, p + 1, p)
    return np.concatenate([p[:c], [c], p[c:]])


def scrambled_radical_inverse(base_index, index, perm=None, seed=0):
    """Radical inverse with per-digit permutation scrambling
    (reference: qmc.h scrambled eval).  perm: [b] uint32 digit permutation
    (defaults to the Faure permutation of the base)."""
    b = int(PRIMES[base_index])
    if perm is None:
        perm = faure_permutation(b, seed)
    perm = jnp.asarray(perm, jnp.uint32)
    index = jnp.asarray(index, jnp.uint32)
    inv_b = 1.0 / b
    n_iter = int(np.ceil(32 / np.log2(b)))

    def body(_, st):
        n, result, factor = st
        digit = perm[(n % b).astype(jnp.int32)].astype(jnp.float32)
        return n // b, result + digit * factor, factor * inv_b

    _, result, _ = jax.lax.fori_loop(
        0, n_iter, body,
        (index, jnp.zeros(index.shape, jnp.float32),
         jnp.full(index.shape, inv_b, jnp.float32)),
    )
    # scrambled series of an all-zero tail: perm[0] repeating
    tail = float(perm[0]) * inv_b ** (n_iter + 1) / (1.0 - inv_b)
    return jnp.minimum(result + tail, 1.0 - 1e-7)


def halton(index, dim, scrambled=False):
    """dim-th coordinate of the Halton sequence at `index`
    (reference: qmc.h / Halton sampler construction)."""
    if scrambled:
        return scrambled_radical_inverse(dim, index)
    return radical_inverse(dim, index)


def hammersley(index, dim, n):
    """dim-th coordinate of an n-point Hammersley set: first coordinate is
    index/n, the rest are Halton dims shifted down by one."""
    index = jnp.asarray(index, jnp.uint32)
    if dim == 0:
        return (index.astype(jnp.float32) + 0.5) / float(n)
    return radical_inverse(dim - 1, index)
