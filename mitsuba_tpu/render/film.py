"""Film + reconstruction filters.

TPU-native replacement for Film/ImageBlock
(reference: src/render/film.cpp, imageblock.cpp, src/rfilters/*).

Design: instead of filter-weighted scatter splatting with atomic
dr::scatter_reduce (reference: imageblock.cpp:122-126), we use *filter
importance sampling*: the per-pixel sample position is drawn from the
normalized reconstruction filter around the pixel center, so every sample
contributes weight 1 to exactly its own pixel.  The wavefront is pixel-major
[H*W*spp], so film accumulation is a reshape + mean over the spp axis — no
scatter, no atomics, perfectly coalesced (the TPU analog of the reference's
"coalesce" fast path for aligned spp writes, imageblock.cpp:261-264).
Box/tent/gaussian filters are exact under this scheme; mitchell/catmullrom/
lanczos (negative lobes) fall back to gaussian sampling.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.warp import interval_to_tent


@struct.dataclass
class Film:
    """hdrfilm config (reference: src/films/hdrfilm.cpp)."""

    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    rfilter: str = struct.field(pytree_node=False, default="gaussian")
    crop_offset: tuple = struct.field(pytree_node=False, default=(0, 0))
    crop_size: tuple = struct.field(pytree_node=False, default=None)
    # specfilm: sensor response functions, one spectrum per output channel
    # (reference: src/films/specfilm.cpp) — empty tuple = plain hdrfilm.
    # Channels are SRF-weighted average radiances: int srf*L / int srf
    # (srf_norms = the load-time quadrature of each SRF over [360, 830] nm)
    srfs: tuple = ()
    srf_norms: tuple = struct.field(pytree_node=False, default=())

    @property
    def n_pixels(self):
        return self.width * self.height


def sample_filter_offset(rfilter: str, u2):
    """Offset within a pixel, importance-sampled from the reconstruction
    filter, in pixel units relative to the pixel's lower corner."""
    if rfilter == "box":
        return u2
    if rfilter == "tent":
        # tent with radius 1 px
        return 0.5 + jnp.stack(
            [interval_to_tent(u2[..., 0]), interval_to_tent(u2[..., 1])], axis=-1
        )
    # gaussian (default, also the fallback for mitchell/catmullrom/lanczos):
    # stddev 0.5/1.5 px truncated loosely, matching the reference gaussian
    # rfilter's stddev=0.5 within 4 sigma (src/rfilters/gaussian.cpp)
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u2[..., 0] * 0.9999, 1e-9)))
    phi = 2.0 * jnp.pi * u2[..., 1]
    sigma = 1.0 / 3.0
    return 0.5 + sigma * jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def film_positions(film: Film, spp: int, jitter):
    """Per-lane film-plane sample positions in [0,1]^2, pixel-major layout:
    lane = (y * W + x) * spp + s.  jitter: [N, 2] in-pixel offsets."""
    w, h = film.width, film.height
    n = w * h * spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    pix = lane // jnp.uint32(spp)
    px = (pix % jnp.uint32(w)).astype(jnp.float32)
    py = (pix // jnp.uint32(w)).astype(jnp.float32)
    pos = jnp.stack([px, py], axis=-1) + jitter
    return pos / jnp.asarray([w, h], jnp.float32)


def develop(film: Film, values, spp: int):
    """Pixel-major per-lane radiance -> image.

    [H*W*spp, C]    -> [H, W, C]       (unpolarized)
    [H*W*spp, C, 4] -> [H, W, 4, C]    (polarized: Stokes-major channel layout
                      I/Q/U/V[.lambda], reference: integrator.cpp:1189-1235)"""
    rest = values.shape[1:]
    img = values.reshape((film.height, film.width, spp) + rest)
    img = jnp.mean(img, axis=2)
    if len(rest) == 2:  # [C, 4] -> [4, C]
        img = jnp.swapaxes(img, -1, -2)
    return img
