"""Pallas TPU closest-hit kernel.

Replaces the XLA chunked-scan triangle sweep (render/shapes.py) on TPU: that
path materializes [N, T] intermediates in HBM and is bandwidth-bound (~28
Mray/s isolated on v5e for the cornell box).  Here ray blocks live in VMEM,
the whole (padded) triangle table sits in SMEM as scalars, and the
Moller-Trumbore loop runs over triangles with the closest-hit reduction in
registers — HBM traffic is one read of the rays and one write of the hits.

Scope: scenes with up to MAX_SMEM_TRIS triangles (the acceptance configs are
tens of triangles; a wide-BVH kernel takes over beyond this).  Gradients: the
kernel is wrapped in a custom_vjp with *analytic* ray derivatives of the
planar hit (dt/do = -n/(d.n), dt/dd = -t n/(d.n)); geometry arrays receive
zero cotangents (shape optimization is handled by the projective layer, not
by differentiating the intersection itself — matching the reference's
detached-sampling integrators, prb.py)."""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SMEM_TRIS = 4096
BLOCK_ROWS = 8          # sublanes per block
LANES = 128             # lane width
BLOCK = BLOCK_ROWS * LANES


def _kernel(tri_ref, n_tri_ref, ox, oy, oz, dx, dy, dz, mt,
            t_out, p_out, u_out, v_out):
    o_x = ox[...]
    o_y = oy[...]
    o_z = oz[...]
    d_x = dx[...]
    d_y = dy[...]
    d_z = dz[...]
    maxt = mt[...]

    best_t = maxt
    best_p = jnp.full(o_x.shape, -1, jnp.int32)
    best_u = jnp.zeros(o_x.shape, jnp.float32)
    best_v = jnp.zeros(o_x.shape, jnp.float32)

    # Static trip count: the table's row count is a trace-time constant equal
    # to geometry.n_tris (shapes.py pads both together), so the loop bound
    # can be compile-time — lets Mosaic unroll/pipeline the triangle sweep
    # instead of a serial scalar-bounded loop (n_tri_ref kept for ABI only;
    # padded rows are degenerate -> det==0 -> never hit).
    n_tri = tri_ref.shape[0]

    def body(k, carry):
        bt, bp, bu, bv = carry
        v0x = tri_ref[k, 0]
        v0y = tri_ref[k, 1]
        v0z = tri_ref[k, 2]
        e1x = tri_ref[k, 3]
        e1y = tri_ref[k, 4]
        e1z = tri_ref[k, 5]
        e2x = tri_ref[k, 6]
        e2y = tri_ref[k, 7]
        e2z = tri_ref[k, 8]

        # pvec = d x e2
        pvx = d_y * e2z - d_z * e2y
        pvy = d_z * e2x - d_x * e2z
        pvz = d_x * e2y - d_y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = o_x - v0x
        tvy = o_y - v0y
        tvz = o_z - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > 0.0) & (t < bt)
        )
        bt = jnp.where(hit, t, bt)
        bp = jnp.where(hit, k, bp)
        bu = jnp.where(hit, u, bu)
        bv = jnp.where(hit, v, bv)
        return bt, bp, bu, bv

    carry = (best_t, best_p, best_u, best_v)
    if n_tri <= 64:
        # full unroll: the whole sweep becomes one straight-line block
        for k in range(n_tri):
            carry = body(k, carry)
    else:
        carry = jax.lax.fori_loop(0, n_tri, body, carry, unroll=8)
    best_t, best_p, best_u, best_v = carry

    t_out[...] = best_t
    p_out[...] = best_p
    u_out[...] = best_u
    v_out[...] = best_v


def _pallas_intersect(tri_table, n_tri, ox, oy, oz, dx, dy, dz, maxt):
    """All ray components are [R, 128] with R a multiple of BLOCK_ROWS."""
    R = ox.shape[0]
    grid = (R // BLOCK_ROWS,)
    interpret = jax.default_backend() == "cpu"   # CPU: Pallas interpreter (tests)

    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # tri table [T, 9]
            pl.BlockSpec(memory_space=pltpu.SMEM),       # n_tri [1]
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(tri_table, n_tri, ox, oy, oz, dx, dy, dz, maxt)


@jax.custom_vjp
def tri_intersect(tri_table, n_tri, o, d, maxt):
    """Closest-hit over a triangle table.

    tri_table: [T, 9] (v0 | e1 | e2) float32 (T <= MAX_SMEM_TRIS)
    o, d: [N, 3]; maxt: [N] (-inf disables a lane)
    Returns (t [N] (inf on miss), prim [N] int32 (-1 on miss), u [N], v [N]).
    """
    return _tri_intersect_impl(tri_table, n_tri, o, d, maxt)


def _use_mxu():
    import os

    return os.environ.get("MI_TPU_MXU_INTERSECT", "0") == "1"


def _tri_intersect_impl(tri_table, n_tri, o, d, maxt):
    if _use_mxu():
        # MXU matmul formulation (ops/intersect_mxu.py): same contract,
        # determinants on the systolic array instead of the VPU
        from .intersect_mxu import build_mxu_cols, mxu_intersect

        cols = build_mxu_cols(
            tri_table[:, 0:3], tri_table[:, 3:6], tri_table[:, 6:9]
        )
        return mxu_intersect(cols, o, d, maxt)
    n = o.shape[0]
    pad = (-n) % BLOCK
    npad = n + pad

    def to_blocks(x, fill):
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x
        return x.reshape(npad // LANES, LANES)

    ox = to_blocks(o[:, 0], 0.0)
    oy = to_blocks(o[:, 1], 0.0)
    oz = to_blocks(o[:, 2], 0.0)
    dx = to_blocks(d[:, 0], 0.0)
    dy = to_blocks(d[:, 1], 0.0)
    dz = to_blocks(d[:, 2], 1.0)
    mt = to_blocks(maxt, -1.0)

    t, p, u, v = _pallas_intersect(tri_table, n_tri, ox, oy, oz, dx, dy, dz, mt)

    t = t.reshape(-1)[:n]
    p = p.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    t = jnp.where(p >= 0, t, jnp.inf)
    return t, p, u, v


def mt_vjp(e1, e2, d, g_t, g_u, g_v, valid):
    """Shared Möller-Trumbore VJP core.

    The hit solves M x = b with M = [-d | e1 | e2] (columns), b = o - v0,
    x = (t, u, v).  For cotangent g on x, y = M^{-T} g satisfies
      <g, dx> = <y, do - dv0 + t dd - u de1 - v de2>
    so grad_o = y, grad_v0 = -y, grad_d = t y, grad_e1 = -u y,
    grad_e2 = -v y.  Using M^{-1} = adj/det with det = -(d . e1xe2):
      y = (g_t (e1xe2) + g_u (d x e2) + g_v (e1 x d)) / det.
    This supplies the *interior* (smooth) term of shape derivatives
    (reference: mesh vertex_positions marked Differentiable|Discontinuous,
    src/render/mesh.cpp:84-91 — the Discontinuous part is the projective
    layer's job, ad/projective_util.py)."""
    nrm = jnp.cross(e1, e2)
    det = -jnp.sum(d * nrm, axis=-1)
    ok = valid & (jnp.abs(det) > 1e-12)
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    y = (
        g_t[:, None] * nrm
        + g_u[:, None] * jnp.cross(d, e2)
        + g_v[:, None] * jnp.cross(e1, d)
    ) * inv_det[:, None]
    return jnp.where(ok[:, None], y, 0.0)


def _fwd(tri_table, n_tri, o, d, maxt):
    out = _tri_intersect_impl(tri_table, n_tri, o, d, maxt)
    t, p, u, v = out
    return out, (tri_table, p, t, u, v, o, d)


def _bwd(res, cts):
    """Full analytic VJP of the planar hit: ray (o, d) AND geometry
    (v0, e1, e2) derivatives via mt_vjp; geometry cotangents scatter-add
    into the triangle table."""
    tri_table, p, t, u, v, o, d = res
    ct_t, ct_p, ct_u, ct_v = cts
    safe_p = jnp.maximum(p, 0)
    e1 = tri_table[safe_p, 3:6]
    e2 = tri_table[safe_p, 6:9]
    valid = p >= 0
    y = mt_vjp(e1, e2, d, ct_t, ct_u, ct_v, valid)
    ct_rows = jnp.concatenate(
        [-y, -u[:, None] * y, -v[:, None] * y], axis=-1
    )  # d/d(v0 | e1 | e2)
    ct_table = jnp.zeros_like(tri_table).at[safe_p].add(
        jnp.where(valid[:, None], ct_rows, 0.0)
    )
    return (
        ct_table,
        np.zeros((1,), jax.dtypes.float0),   # n_tri (integer input)
        y,
        t[:, None] * y,
        jnp.zeros_like(t),
    )


tri_intersect.defvjp(_fwd, _bwd)


def build_tri_table(geometry):
    """[T, 9] SMEM-resident triangle table from a Geometry (host-side)."""
    return jnp.concatenate(
        [geometry.tri_v0, geometry.tri_e1, geometry.tri_e2], axis=-1
    ).astype(jnp.float32)
