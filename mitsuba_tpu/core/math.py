"""Math constants and numerics helpers (reference: include/mitsuba/core/math.h)."""
from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846
INV_PI = 1.0 / PI
TWO_PI = 2.0 * PI
INV_TWO_PI = 1.0 / TWO_PI
FOUR_PI = 4.0 * PI
INV_FOUR_PI = 1.0 / FOUR_PI

RAY_EPSILON = 1e-4          # min-t offset for secondary rays
SHADOW_EPSILON = 1e-4
EPSILON = 1e-7
INF = jnp.inf


def safe_sqrt(x):
    """sqrt clamped at 0 with a FINITE derivative everywhere: the naive
    sqrt(max(x, 0)) has d/dx = inf at x = 0, which poisons reverse-mode
    chains (0 * inf = NaN) wherever a masked lane lands exactly on the clamp
    (e.g. the VNDF sampler's p3 = sqrt(1 - p1^2 - p2^2) at the disk rim).
    The where() keeps the primal bit-identical for x > 1e-12 and pins both
    value and derivative to 0 on the clamped branch."""
    return jnp.where(x > 0, jnp.sqrt(jnp.maximum(x, 1e-12)), 0.0)


def safe_rsqrt(x):
    return jnp.where(x > 0, 1.0 / jnp.sqrt(jnp.maximum(x, 1e-30)), 0.0)


def safe_div(a, b, eps=1e-20):
    """a/b with 0 where |b| < eps — masked-lane-safe division."""
    ok = jnp.abs(b) > eps
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def rcp(x):
    return 1.0 / x


def sqr(x):
    return x * x


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def mulsign(x, s):
    return jnp.where(s >= 0, x, -x)


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def lookup_rows(table, idx, max_onehot=64):
    """Row lookup `table[idx]` tuned for TPU.

    XLA lowers per-lane gathers to a slow serial path on TPU (measured 11x
    slower than the MXU for a [2.1M]-lane lookup from a tiny table).  For
    small tables we instead build a one-hot [N, K] matrix and contract it with
    the table on the MXU — exact (0/1 weights at HIGHEST precision) and an
    order of magnitude faster.  Large tables fall back to the native gather.

    table: [K] or [K, D] float array;  idx: integer array [N...].
    """
    import jax

    K = table.shape[0]
    if K > max_onehot or not jnp.issubdtype(table.dtype, jnp.floating):
        return table[idx]
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    oh = (idx[..., None] == jnp.arange(K, dtype=idx.dtype)).astype(t.dtype)
    out = jnp.matmul(oh, t, precision=jax.lax.Precision.HIGHEST)
    return out[..., 0] if squeeze else out
