"""Counter-based RNG streams (TPU-native analog of the reference's PCG32 sampler).

The reference seeds one PCG32 stream per wavefront lane via a TEA hash of
(base_seed, lane index) (reference: src/render/sampler.cpp:85-92) and advances a
per-sample dimension counter (sampler.cpp:52-55).  Identical-replay between the
primal and backward (PRB) passes requires that both passes consume random
numbers in exactly the same per-lane order.

Here we use a pure counter-based design instead of stateful streams: every
random draw is threefry2x32(key=(seed, SALT), counter=(lane, dim)).  This is
stateless, order-independent, vectorizes perfectly on the VPU, and makes PRB
replay trivial (recompute the same (lane, dim) pairs in the backward kernel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_ROT_0 = (13, 15, 26, 6)
_ROT_1 = (17, 29, 16, 24)


def _rotl(x, d):
    return (x << d) | (x >> (32 - d))


def threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32 block cipher (20 rounds), pure jnp uint32.

    Counter-based analog of the reference's per-lane PCG32 streams
    (reference: src/samplers/independent.cpp:68-90)."""
    u32 = jnp.uint32
    k0 = jnp.asarray(k0, u32)
    k1 = jnp.asarray(k1, u32)
    x0 = jnp.asarray(c0, u32) + k0
    x1 = jnp.asarray(c1, u32) + k1
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    keys = (k0, k1, ks2)
    for block in range(5):
        rots = _ROT_0 if block % 2 == 0 else _ROT_1
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, jnp.uint32(r)) ^ x0
        inj = block + 1
        x0 = x0 + keys[inj % 3]
        x1 = x1 + keys[(inj + 1) % 3] + jnp.uint32(inj)
    return x0, x1


def uniform_from_bits(bits):
    """uint32 -> float32 uniform in [0, 1) with 24-bit mantissa precision."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


class RNG:
    """Per-lane random stream with a dimension counter.

    Mirrors the contract of the reference Sampler (reference:
    include/mitsuba/render/sampler.h: next_1d/next_2d, advance(), fork()) in a
    functional style: `lane` is an int32/uint32 array of lane indices, `seed`
    a python/int scalar, and the dimension counter lives in user code (it is
    returned so callers can thread it through lax loops)."""

    __slots__ = ("seed", "lane", "dim")

    def __init__(self, seed, lane, dim=0):
        self.seed = jnp.asarray(seed, jnp.uint32)
        self.lane = jnp.asarray(lane, jnp.uint32)
        self.dim = jnp.asarray(dim, jnp.uint32)

    def tree_flatten(self):
        return (self.seed, self.lane, self.dim), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        obj.seed, obj.lane, obj.dim = leaves
        return obj

    def next_1d(self):
        b0, _ = threefry2x32(self.seed, jnp.uint32(0x9E3779B9), self.lane, self.dim)
        return uniform_from_bits(b0), RNG(self.seed, self.lane, self.dim + 1)

    def next_2d(self):
        b0, b1 = threefry2x32(self.seed, jnp.uint32(0x9E3779B9), self.lane, self.dim)
        return uniform_from_bits(b0), uniform_from_bits(b1), RNG(self.seed, self.lane, self.dim + 2)

    def fork(self, salt):
        """Decorrelated child stream (analog of Sampler::fork, used by NEE
        replay with a cloned sampler, reference: prb_polarized.py:232)."""
        b0, _ = threefry2x32(self.seed, jnp.uint32(salt), self.lane, jnp.uint32(0xC0FFEE))
        return RNG(self.seed ^ jnp.uint32(salt) ^ jnp.uint32(0xA5A5A5A5), self.lane, self.dim)


jax.tree_util.register_pytree_node(
    RNG, lambda r: r.tree_flatten(), RNG.tree_unflatten
)


def sample_tea_32(v0, v1, rounds=4):
    """TEA hash, mirrors reference sample_tea_32 (src/render/sampler.cpp:85-92)
    used for per-lane seed decorrelation."""
    u32 = jnp.uint32
    v0 = jnp.asarray(v0, u32)
    v1 = jnp.asarray(v1, u32)
    s = jnp.uint32(0)
    for _ in range(rounds):
        s = s + jnp.uint32(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + u32(0xA341316C)) ^ (v1 + s) ^ ((v1 >> 5) + u32(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + u32(0xAD90777D)) ^ (v0 + s) ^ ((v0 >> 5) + u32(0x7E95761E)))
    return v0, v1
