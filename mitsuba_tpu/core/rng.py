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

Low-discrepancy mode (reference: src/samplers/{ldsampler,orthogonal}.cpp and
the pbrt padded-Sobol design): when the RNG carries (pixel, sample-index)
identity, every dimension PAIR draws the (0,2)-sequence point of the lane's
sample index, Owen-scrambled per (pixel, pair) with the Laine-Karras hash.
Path dimensions are then stratified over the samples of each pixel — the full
variance reduction the reference samplers deliver — while staying stateless
and replay/partition invariant (the draw is a pure function of
(seed, pixel, sample, dim)).
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


def _reverse_bits(v):
    v = ((v & jnp.uint32(0x55555555)) << 1) | ((v & jnp.uint32(0xAAAAAAAA)) >> 1)
    v = ((v & jnp.uint32(0x33333333)) << 2) | ((v & jnp.uint32(0xCCCCCCCC)) >> 2)
    v = ((v & jnp.uint32(0x0F0F0F0F)) << 4) | ((v & jnp.uint32(0xF0F0F0F0)) >> 4)
    v = ((v & jnp.uint32(0x00FF00FF)) << 8) | ((v & jnp.uint32(0xFF00FF00)) >> 8)
    return (v << 16) | (v >> 16)


def _owen_scramble(bits, key):
    """Hash-based nested uniform (Owen) scrambling, Laine-Karras style
    (Burley 2020 'Practical Hash-based Owen Scrambling')."""
    v = _reverse_bits(bits)
    v = v + key
    v = v ^ (v * jnp.uint32(0x6C50B47C))
    v = v ^ (v * jnp.uint32(0xB82F1E52))
    v = v ^ (v * jnp.uint32(0xC7AFE638))
    v = v ^ (v * jnp.uint32(0x8D22F6E6))
    return _reverse_bits(v)


def _sobol02_bits(index):
    """The two components of the (0,2)-sequence at `index` as uint32 bit
    patterns (van der Corput + Sobol' dim 2)."""
    i = index.astype(jnp.uint32)
    x = _reverse_bits(i)
    y = jnp.zeros_like(i)
    v = jnp.broadcast_to(jnp.uint32(1 << 31), i.shape)
    idx = i

    def body(k, carry):
        y, idx, v = carry
        y = jnp.where((idx & 1) == 1, y ^ v, y)
        return (y, idx >> 1, v ^ (v >> 1))

    y, _, _ = jax.lax.fori_loop(0, 32, body, (y, idx, v))
    return x, y


def _permute_kensler(i, l, p):
    """Stateless pseudorandom permutation of [0, l) (Kensler 2013 hash
    permute with power-of-two cycle walking; reference:
    src/samplers/orthogonal.cpp permute_kensler usage).  `l` is a static
    python int; returns uint32 in [0, l)."""
    w = 1
    while w < l:
        w <<= 1
    w = jnp.uint32(w - 1)
    i = jnp.asarray(i, jnp.uint32)
    p = jnp.asarray(p, jnp.uint32)

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

    i = mix(i)
    for _ in range(3):
        i = jnp.where(i >= l, mix(i), i)
    return jnp.minimum(i, jnp.uint32(l - 1))


def _bose_oa_1d(sidx, dim, pixel, seed, p_res, lane):
    """Strength-2 orthogonal-array point via the Bose construction
    (Jarosz et al. 2019; reference: src/samplers/orthogonal.cpp bose()).

    For every dimension pair the per-pixel p_res^2 samples form a correlated
    multi-jittered pattern; 1D projections are stratified into p_res strata
    with exactly p_res samples each.  `p_res` is a static prime."""
    n = p_res * p_res
    # per-pixel (per-sequence) permutation seed
    ps, _ = threefry2x32(seed, jnp.uint32(0x0A5EED0A), pixel, jnp.uint32(0))
    i = _permute_kensler(jnp.asarray(sidx, jnp.uint32) % jnp.uint32(n), n, ps)
    a0 = i // jnp.uint32(p_res)
    a1 = i % jnp.uint32(p_res)
    j = jnp.asarray(dim, jnp.uint32)
    k = jnp.where((j & 1) > 0, j - 1, j + 1)
    a_ij = (a0 + (j - 1) * a1) % jnp.uint32(p_res)
    a_ik = (a0 + (k - 1) * a1) % jnp.uint32(p_res)
    a_ij = jnp.where(j == 0, a0, jnp.where(j == 1, a1, a_ij))
    a_ik = jnp.where(j == 0, a1, jnp.where(j == 1, a0, a_ik))
    stratum = _permute_kensler(a_ij, p_res, ps * (j + 1) * jnp.uint32(0x51633E2D))
    sub = _permute_kensler(a_ik, p_res, ps * (j + 1) * jnp.uint32(0x68BC21EB))
    jit_bits, _ = threefry2x32(seed, jnp.uint32(0x9E3779B9), lane, dim)
    jit = uniform_from_bits(jit_bits)
    inv_p = jnp.float32(1.0 / p_res)
    return (stratum.astype(jnp.float32)
            + (sub.astype(jnp.float32) + jit) * inv_p) * inv_p


def smallest_prime_resolution(spp):
    """Smallest prime p with p*p >= spp (reference:
    src/samplers/orthogonal.cpp set_sample_count)."""
    def is_prime(x):
        if x < 2:
            return False
        f = 2
        while f * f <= x:
            if x % f == 0:
                return False
            f += 1
        return True

    p = 2
    while p * p < spp or not is_prime(p):
        p += 1
    return p


class RNG:
    """Per-lane random stream with a dimension counter.

    Mirrors the contract of the reference Sampler (reference:
    include/mitsuba/render/sampler.h: next_1d/next_2d, advance(), fork()) in a
    functional style: `lane` is an int32/uint32 array of lane indices, `seed`
    a python/int scalar, and the dimension counter lives in user code (it is
    returned so callers can thread it through lax loops)."""

    __slots__ = ("seed", "lane", "dim", "pixel", "sidx", "lds", "oa")

    def __init__(self, seed, lane, dim=0, pixel=None, sidx=None, lds=False,
                 oa=0):
        self.seed = jnp.asarray(seed, jnp.uint32)
        self.lane = jnp.asarray(lane, jnp.uint32)
        self.dim = jnp.asarray(dim, jnp.uint32)
        self.pixel = None if pixel is None else jnp.asarray(pixel, jnp.uint32)
        self.sidx = None if sidx is None else jnp.asarray(sidx, jnp.uint32)
        self.lds = bool(lds) and pixel is not None and sidx is not None
        # orthogonal-array mode: static prime grid resolution (0 = off)
        self.oa = int(oa) if pixel is not None and sidx is not None else 0

    def tree_flatten(self):
        if self.lds or self.oa:
            return (
                (self.seed, self.lane, self.dim, self.pixel, self.sidx),
                (self.lds, self.oa),
            )
        return (self.seed, self.lane, self.dim), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        if aux is not None:
            obj.seed, obj.lane, obj.dim, obj.pixel, obj.sidx = leaves
            obj.lds, obj.oa = aux
        else:
            obj.seed, obj.lane, obj.dim = leaves
            obj.pixel = None
            obj.sidx = None
            obj.lds = False
            obj.oa = 0
        return obj

    def _lds_pair(self):
        """Owen-scrambled (0,2)-sequence point for this lane's sample index,
        decorrelated per (pixel, dimension-pair)."""
        pair = self.dim >> 1
        k0, k1 = threefry2x32(
            self.seed, jnp.uint32(0x10D5EED5), self.pixel, pair
        )
        xb, yb = _sobol02_bits(self.sidx)
        return (
            uniform_from_bits(_owen_scramble(xb, k0)),
            uniform_from_bits(_owen_scramble(yb, k1)),
        )

    def _clone(self, dim):
        return RNG(self.seed, self.lane, dim, self.pixel, self.sidx, self.lds,
                   self.oa)

    def next_1d(self):
        if self.oa:
            u = _bose_oa_1d(self.sidx, self.dim, self.pixel, self.seed,
                            self.oa, self.lane)
            return u, self._clone(self.dim + 1)
        if self.lds:
            # even dim -> first component of the pair, odd -> second
            u0, u1 = self._lds_pair()
            u = jnp.where((self.dim & 1) == 0, u0, u1)
            return u, self._clone(self.dim + 1)
        b0, _ = threefry2x32(self.seed, jnp.uint32(0x9E3779B9), self.lane, self.dim)
        return uniform_from_bits(b0), RNG(self.seed, self.lane, self.dim + 1)

    def next_2d(self):
        if self.oa:
            # consecutive dims are jointly stratified by OA strength 2
            u0, r = self.next_1d()
            u1, r = r.next_1d()
            return u0, u1, r
        if self.lds:
            # align to a fresh pair so both components stratify together
            dim = self.dim + (self.dim & 1)
            r = self._clone(dim)
            u0, u1 = r._lds_pair()
            return u0, u1, self._clone(dim + 2)
        b0, b1 = threefry2x32(self.seed, jnp.uint32(0x9E3779B9), self.lane, self.dim)
        return uniform_from_bits(b0), uniform_from_bits(b1), RNG(self.seed, self.lane, self.dim + 2)

    def fork(self, salt):
        """Decorrelated child stream (analog of Sampler::fork, used by NEE
        replay with a cloned sampler, reference: prb_polarized.py:232)."""
        b0, _ = threefry2x32(self.seed, jnp.uint32(salt), self.lane, jnp.uint32(0xC0FFEE))
        return RNG(
            self.seed ^ jnp.uint32(salt) ^ jnp.uint32(0xA5A5A5A5), self.lane,
            self.dim, self.pixel, self.sidx, self.lds, self.oa,
        )


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
