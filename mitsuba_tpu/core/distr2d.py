"""Parameterized 2D distributions (reference: include/mitsuba/core/distr_2d.h).

MarginalContinuous2D mirrors the reference's Marginal2D<..., Continuous=true>:
a piecewise-bilinear density on [0,1]^2 sampled by inverting the marginal
(rows) then the conditional (columns), each a piecewise-LINEAR density whose
CDF segments are quadratics.  Up to 3 conditional parameter dimensions are
supported; tables are blended linearly over the 2^D surrounding parameter
grid corners exactly as the reference's recursive `lookup` does
(distr_2d.h:1090-1108).

All queries are vectorized over lanes; table reads are jnp.take gathers
(tables are small; XLA keeps them in HBM/VMEM as it sees fit).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _bisect(fetch, n, u):
    """First index in [0, n-1] such that count of fetch(idx) < u.
    fetch: idx [N] int32 -> [N] f32; u: [N].  Fixed-trip binary search
    (reference: dr::binary_search)."""
    lo = jnp.zeros_like(u, dtype=jnp.int32)
    hi = jnp.full_like(lo, n - 1)
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        pred = fetch(mid) < u
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return jnp.clip(lo, 0, n - 1)


def _sample_segment(s, inv_width, v0, v1):
    """Invert the CDF of a linear density segment (distr_2d.h sample_segment)."""
    non_const = jnp.abs(v0 - v1) > 1e-4 * (v0 + v1)
    divisor = jnp.where(non_const, v0 - v1, v0 + v1)
    s = s * 2.0 * inv_width
    s_nc = v0 - jnp.sqrt(jnp.maximum(v0 * v0 + s * (v1 - v0), 0.0))
    s = jnp.where(non_const, s_nc, s)
    return jnp.where(divisor != 0.0, s / jnp.where(divisor == 0.0, 1.0, divisor), s)


def _invert_segment(s, width, v0, v1):
    return s * ((1.0 - 0.5 * s) * v0 + 0.5 * s * v1) * width


@struct.dataclass
class MarginalContinuous2D:
    """data: [S, H, W] density; cond_cdf: [S, H, W-1]; marg_cdf: [S, H-1];
    param_values: tuple of 1-D grids (static shapes); strides per dim."""

    data: jnp.ndarray
    cond_cdf: jnp.ndarray
    marg_cdf: jnp.ndarray
    param_values: tuple            # tuple of jnp arrays, may be empty
    param_strides: tuple = struct.field(pytree_node=False, default=())
    normalized: bool = struct.field(pytree_node=False, default=True)

    # -- construction -------------------------------------------------------
    @staticmethod
    def create(data, param_values=(), normalize=True):
        """data: numpy [P0, ..., Pn, H, W]; param_values: n 1-D grids."""
        data = np.asarray(data, np.float64)
        pres = data.shape[:-2]
        H, W = data.shape[-2], data.shape[-1]
        assert len(pres) == len(param_values)
        S = int(np.prod(pres)) if pres else 1
        d = data.reshape(S, H, W)

        scale_x = 0.5 / (W - 1)
        scale_y = 0.5 / (H - 1)
        # conditional CDF along x for EVERY row (Continuous=true layout)
        seg = scale_x * (d[:, :, :-1] + d[:, :, 1:])          # [S, H, W-1]
        cond_cdf = np.cumsum(seg, axis=-1)
        row_int = cond_cdf[:, :, -1]                          # [S, H]
        # marginal CDF over rows
        mseg = scale_y * (row_int[:, :-1] + row_int[:, 1:])   # [S, H-1]
        marg_cdf = np.cumsum(mseg, axis=-1)
        if normalize:
            norm = 1.0 / marg_cdf[:, -1]
            d = d * norm[:, None, None]
            cond_cdf = cond_cdf * norm[:, None, None]
            marg_cdf = marg_cdf * norm[:, None]

        strides = []
        acc = 1
        for p in reversed(pres):
            strides.append(acc)
            acc *= p
        strides = tuple(reversed(strides))
        return MarginalContinuous2D(
            data=jnp.asarray(d, jnp.float32),
            cond_cdf=jnp.asarray(cond_cdf, jnp.float32),
            marg_cdf=jnp.asarray(marg_cdf, jnp.float32),
            param_values=tuple(jnp.asarray(p, jnp.float32) for p in param_values),
            param_strides=strides,
            normalized=bool(normalize),
        )

    # -- parameter interpolation -------------------------------------------
    def _param_weights(self, params):
        """Per-dim (index [N], weight1 [N]); corner blending happens in _lookup.
        (reference: Distribution2D::interpolate_weights)."""
        out = []
        for d, pv in enumerate(self.param_values):
            P = pv.shape[0]
            p = params[d]
            if P == 1:
                out.append((jnp.zeros_like(p, dtype=jnp.int32), jnp.zeros_like(p)))
                continue
            idx = jnp.clip(jnp.searchsorted(pv, p, side="right") - 1, 0, P - 2)
            p0 = pv[idx]
            p1 = pv[idx + 1]
            w1 = jnp.clip((p - p0) / jnp.maximum(p1 - p0, 1e-20), 0.0, 1.0)
            out.append((idx.astype(jnp.int32), w1))
        return out

    def _lookup(self, table, elem_idx, pw):
        """Blend table[slice, elem] over the 2^D parameter corners.
        table: [S, K...] flattened to [S, K]; elem_idx: [N] int32."""
        S = table.shape[0]
        flat = table.reshape(S, -1)
        K = flat.shape[1]
        D = len(pw)
        if D == 0:
            return flat[0].take(elem_idx)
        acc = 0.0
        for corner in range(1 << D):
            w = 1.0
            sl = jnp.zeros_like(elem_idx)
            skip = False
            for d in range(D):
                idx, w1 = pw[d]
                P = self.param_values[d].shape[0]
                b = (corner >> d) & 1
                if b and P == 1:
                    skip = True
                    break
                w = w * (w1 if b else (1.0 - w1))
                sl = sl + (idx + b) * self.param_strides[d]
            if skip:
                continue
            acc = acc + w * jnp.take(flat.reshape(-1), sl * K + elem_idx)
        return acc

    # -- queries ------------------------------------------------------------
    def sample(self, u, params=()):
        """u: [N,2] uniform; returns (pos [N,2] in [0,1]^2, pdf [N])."""
        H = self.data.shape[1]
        W = self.data.shape[2]
        n_marg = H - 1
        pw = self._param_weights(params)
        eps = 1e-7
        ux = jnp.clip(u[..., 0], eps, 1.0 - eps)
        uy = jnp.clip(u[..., 1], eps, 1.0 - eps)

        def fetch_marg(idx):
            return self._lookup(self.marg_cdf, idx, pw)

        if not self.normalized:
            uy = uy * fetch_marg(jnp.full_like(ux, n_marg - 1, dtype=jnp.int32))

        row = _bisect(fetch_marg, n_marg, uy)
        row = jnp.minimum(row, H - 2)
        uy = uy - jnp.where(row > 0, fetch_marg(jnp.maximum(row - 1, 0)), 0.0)

        # conditional CDF totals of the two surrounding rows (x == 1)
        cc = self.cond_cdf
        r0 = self._lookup(cc, row * (W - 1) + (W - 2), pw)
        r1 = self._lookup(cc, (row + 1) * (W - 1) + (W - 2), pw)
        fy = _sample_segment(uy, float(H - 1), r0, r1)
        ux = ux * ((1.0 - fy) * r0 + fy * r1)

        def fetch_cond(idx):
            v0 = self._lookup(cc, row * (W - 1) + idx, pw)
            v1 = self._lookup(cc, (row + 1) * (W - 1) + idx, pw)
            return (1.0 - fy) * v0 + fy * v1

        col = _bisect(fetch_cond, W - 1, ux)
        col = jnp.minimum(col, W - 2)
        ux = ux - jnp.where(col > 0, fetch_cond(jnp.maximum(col - 1, 0)), 0.0)

        base = row * W + col
        v00 = self._lookup(self.data, base, pw)
        v10 = self._lookup(self.data, base + 1, pw)
        v01 = self._lookup(self.data, base + W, pw)
        v11 = self._lookup(self.data, base + W + 1, pw)
        c0 = (1.0 - fy) * v00 + fy * v01
        c1 = (1.0 - fy) * v10 + fy * v11
        fx = _sample_segment(ux, float(W - 1), c0, c1)

        pos = jnp.stack(
            [(col + fx) / (W - 1), (row + fy) / (H - 1)], axis=-1
        )
        pdf = (1.0 - fx) * c0 + fx * c1
        return pos, pdf

    def invert(self, pos, params=()):
        """Inverse of sample(); returns (u [N,2], pdf [N])."""
        H = self.data.shape[1]
        W = self.data.shape[2]
        n_marg = H - 1
        pw = self._param_weights(params)
        px = jnp.clip(pos[..., 0], 0.0, 1.0) * (W - 1)
        py = jnp.clip(pos[..., 1], 0.0, 1.0) * (H - 1)
        col = jnp.minimum(px.astype(jnp.int32), W - 2)
        row = jnp.minimum(py.astype(jnp.int32), H - 2)
        fx = px - col
        fy = py - row

        base = row * W + col
        v00 = self._lookup(self.data, base, pw)
        v10 = self._lookup(self.data, base + 1, pw)
        v01 = self._lookup(self.data, base + W, pw)
        v11 = self._lookup(self.data, base + W + 1, pw)
        c0 = (1.0 - fy) * v00 + fy * v01
        c1 = (1.0 - fy) * v10 + fy * v11
        pdf = (1.0 - fx) * c0 + fx * c1

        ux = _invert_segment(fx, 1.0 / (W - 1), c0, c1)

        cc = self.cond_cdf

        def fetch_cond(idx):
            v0 = self._lookup(cc, row * (W - 1) + idx, pw)
            v1 = self._lookup(cc, (row + 1) * (W - 1) + idx, pw)
            return (1.0 - fy) * v0 + fy * v1

        ux = ux + jnp.where(col > 0, fetch_cond(jnp.maximum(col - 1, 0)), 0.0)
        r0 = self._lookup(cc, row * (W - 1) + (W - 2), pw)
        r1 = self._lookup(cc, (row + 1) * (W - 1) + (W - 2), pw)
        denom = (1.0 - fy) * r0 + fy * r1
        ux = ux / jnp.maximum(denom, 1e-20)

        uy = _invert_segment(fy, 1.0 / (H - 1), r0, r1)

        def fetch_marg(idx):
            return self._lookup(self.marg_cdf, idx, pw)

        uy = uy + jnp.where(row > 0, fetch_marg(jnp.maximum(row - 1, 0)), 0.0)
        if not self.normalized:
            uy = uy / jnp.maximum(
                fetch_marg(jnp.full_like(row, n_marg - 1)), 1e-20
            )
        return jnp.stack([ux, uy], axis=-1), pdf

    def eval(self, pos, params=()):
        """Bilinear density at pos [N,2] (distr_2d.h Marginal2D::eval)."""
        H = self.data.shape[1]
        W = self.data.shape[2]
        pw = self._param_weights(params)
        px = jnp.clip(pos[..., 0], 0.0, 1.0) * (W - 1)
        py = jnp.clip(pos[..., 1], 0.0, 1.0) * (H - 1)
        col = jnp.minimum(px.astype(jnp.int32), W - 2)
        row = jnp.minimum(py.astype(jnp.int32), H - 2)
        fx = px - col
        fy = py - row
        base = row * W + col
        v00 = self._lookup(self.data, base, pw)
        v10 = self._lookup(self.data, base + 1, pw)
        v01 = self._lookup(self.data, base + W, pw)
        v11 = self._lookup(self.data, base + W + 1, pw)
        return (1.0 - fy) * ((1.0 - fx) * v00 + fx * v10) + fy * (
            (1.0 - fx) * v01 + fx * v11
        )
