"""Pallas TPU wide-leaf BVH traversal kernel for large meshes.

TPU has no per-lane hardware gather, so the per-lane pointer-chasing
traversal of a classic GPU BVH (reference: src/render/scene_optix.inl,
scene_embree.inl) maps terribly onto it.  This kernel restructures traversal
around the machine instead:

  * The threaded (skip-link) BVH from the native binned-SAH builder
    (native/src/bvh.cpp:mtpu_build_bvh_wide) has wide leaves of up to 64
    triangles, so the node table of a 100k-triangle mesh is a few thousand
    nodes and lives in SMEM — node reads during traversal are cheap scalar
    loads, not gathers.
  * Traversal is BLOCK-SHARED: one node pointer per 1024-ray block
    ([8 sublanes x 128 lanes] in VMEM).  The block visits the union of the
    nodes its rays need; the slab test runs on the whole block at VPU rate.
    Rays should be sorted/coherent for best effect (primary rays are).
  * Leaf sweeps use an 8-triangle x 128-ray OUTER-PRODUCT tile: triangle
    attributes are read as [8, 1] columns of a VMEM [T, 16] table slice and
    broadcast against [1, 128] ray rows — Moller-Trumbore on [8, 128] tiles
    with zero scalar extraction and zero gathers.  Closest-hit reduces over
    the triangle sublane axis.

Termination is structural: `node` strictly increases in DFS order (child =
node+1, skip > node), so the walk is at most n_nodes steps.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import mt_vjp

BLOCK_ROWS = 8
LANES = 128
BLOCK = BLOCK_ROWS * LANES
MAX_WIDE_LEAF = 64          # must match the builder call in render/shapes.py
INT_BIG = 0x7FFFFFF0    # sentinel for the prim-id argmin select


def _kernel(T_pad, nbox_ref, nmeta_ref, tri_ref,
            ox, oy, oz, dx, dy, dz, mt,
            t_out, p_out, u_out, v_out):
    o_x = ox[...]
    o_y = oy[...]
    o_z = oz[...]
    d_x = dx[...]
    d_y = dy[...]
    d_z = dz[...]
    maxt = mt[...]

    eps = 1e-12
    inv_dx = 1.0 / jnp.where(jnp.abs(d_x) < eps, jnp.where(d_x >= 0, eps, -eps), d_x)
    inv_dy = 1.0 / jnp.where(jnp.abs(d_y) < eps, jnp.where(d_y >= 0, eps, -eps), d_y)
    inv_dz = 1.0 / jnp.where(jnp.abs(d_z) < eps, jnp.where(d_z >= 0, eps, -eps), d_z)

    best_t0 = maxt
    best_p0 = jnp.full(o_x.shape, -1, jnp.int32)
    best_u0 = jnp.zeros(o_x.shape, jnp.float32)
    best_v0 = jnp.zeros(o_x.shape, jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0)
    tri_ids8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def cond(s):
        return s[0] >= 0

    def body(s):
        node, bt, bp, bu, bv = s
        # node tables are FLAT 1-D SMEM arrays: a 2-D SMEM window pads its
        # last dim to 128 lanes (4551x6 f32 ballooned to 2.3MB > the 1MB SMEM
        # budget on v5e); flat indexing keeps them at true size
        nb = node * 6
        lo_x = nbox_ref[nb]
        lo_y = nbox_ref[nb + 1]
        lo_z = nbox_ref[nb + 2]
        hi_x = nbox_ref[nb + 3]
        hi_y = nbox_ref[nb + 4]
        hi_z = nbox_ref[nb + 5]
        skip = nmeta_ref[2 * node]
        payload = nmeta_ref[2 * node + 1]

        tx0 = (lo_x - o_x) * inv_dx
        tx1 = (hi_x - o_x) * inv_dx
        ty0 = (lo_y - o_y) * inv_dy
        ty1 = (hi_y - o_y) * inv_dy
        tz0 = (lo_z - o_z) * inv_dz
        tz1 = (hi_z - o_z) * inv_dz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt)
        any_hit = jnp.any(hit)
        is_leaf = payload != 0

        def sweep(acc):
            bt, bp, bu, bv = acc
            start = payload >> 8
            count = payload & 0xFF
            n_groups = (count + 7) // 8

            def gbody(j, acc):
                bt, bp, bu, bv = acc
                g = jnp.minimum(start + 8 * j, T_pad - 8)
                chunk = tri_ref[pl.ds(g, 8), :]          # [8, 16]
                v0x = chunk[:, 0:1]
                v0y = chunk[:, 1:2]
                v0z = chunk[:, 2:3]
                e1x = chunk[:, 3:4]
                e1y = chunk[:, 4:5]
                e1z = chunk[:, 5:6]
                e2x = chunk[:, 6:7]
                e2y = chunk[:, 7:8]
                e2z = chunk[:, 8:9]
                pid = g + tri_ids8                        # [8, 1]
                tri_ok = (pid >= start) & (pid < start + count)

                for r in range(BLOCK_ROWS):
                    o_xr = o_x[r : r + 1, :]              # [1, 128]
                    o_yr = o_y[r : r + 1, :]
                    o_zr = o_z[r : r + 1, :]
                    d_xr = d_x[r : r + 1, :]
                    d_yr = d_y[r : r + 1, :]
                    d_zr = d_z[r : r + 1, :]

                    # pvec = d x e2  -> [8, 128] outer tiles
                    pvx = d_yr * e2z - d_zr * e2y
                    pvy = d_zr * e2x - d_xr * e2z
                    pvz = d_xr * e2y - d_yr * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tvx = o_xr - v0x
                    tvy = o_yr - v0y
                    tvz = o_zr - v0z
                    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    vv = (d_xr * qvx + d_yr * qvy + d_zr * qvz) * inv_det
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    bt_r = bt[r : r + 1, :]
                    hitt = (
                        tri_ok
                        & (jnp.abs(det) > 1e-12)
                        & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                        & (tt > 0.0) & (tt < bt_r)
                    )
                    tt = jnp.where(hitt, tt, jnp.inf)
                    tmin_r = jnp.min(tt, axis=0, keepdims=True)      # [1, 128]
                    improved = tmin_r < bt_r
                    selm = tt == tmin_r
                    pid_r = jnp.min(jnp.where(selm, pid, INT_BIG), axis=0, keepdims=True)
                    u_r = jnp.min(jnp.where(selm, uu, jnp.inf), axis=0, keepdims=True)
                    v_r = jnp.min(jnp.where(selm, vv, jnp.inf), axis=0, keepdims=True)

                    upd = (row_ids == r) & improved                   # [8, 128]
                    bt = jnp.where(upd, tmin_r, bt)
                    bp = jnp.where(upd, pid_r, bp)
                    bu = jnp.where(upd, u_r, bu)
                    bv = jnp.where(upd, v_r, bv)
                return bt, bp, bu, bv

            return jax.lax.fori_loop(0, n_groups, gbody, (bt, bp, bu, bv))

        bt, bp, bu, bv = jax.lax.cond(
            any_hit & is_leaf, sweep, lambda a: a, (bt, bp, bu, bv)
        )
        nxt = jnp.where(any_hit & jnp.logical_not(is_leaf), node + 1, skip)
        return nxt, bt, bp, bu, bv

    node0 = jnp.asarray(0, jnp.int32)
    _, bt, bp, bu, bv = jax.lax.while_loop(
        cond, body, (node0, best_t0, best_p0, best_u0, best_v0)
    )
    t_out[...] = bt
    p_out[...] = bp
    u_out[...] = bu
    v_out[...] = bv


def _pallas_bvh_sweep(nbox, nmeta, tri16, ox, oy, oz, dx, dy, dz, mt):
    R = ox.shape[0]
    T_pad = tri16.shape[0]
    grid = (R // BLOCK_ROWS,)
    interpret = jax.default_backend() == "cpu"

    ray_spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    return pl.pallas_call(
        partial(_kernel, T_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # node bbox flat [M*6]
            pl.BlockSpec(memory_space=pltpu.SMEM),       # node meta flat [M*2] i32
            pl.BlockSpec(memory_space=pltpu.VMEM),       # tri table [T_pad, 16]
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
    )(nbox, nmeta, tri16, ox, oy, oz, dx, dy, dz, mt)


def _sweep_impl(nbox, nmeta, tri_v0, tri_e1, tri_e2, o, d, maxt):
    n = o.shape[0]
    nbox = nbox.reshape(-1)          # flat SMEM layout (see _kernel comment)
    nmeta = nmeta.reshape(-1)
    T = tri_v0.shape[0]
    T_pad = ((T + 8 + 7) // 8) * 8        # 8 spare rows so chunk reads stay in range
    tri16 = jnp.zeros((T_pad, 16), jnp.float32)
    tri16 = tri16.at[:T, 0:3].set(tri_v0)
    tri16 = tri16.at[:T, 3:6].set(tri_e1)
    tri16 = tri16.at[:T, 6:9].set(tri_e2)

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

    t, p, u, v = _pallas_bvh_sweep(nbox, nmeta, tri16, ox, oy, oz, dx, dy, dz, mt)
    t = t.reshape(-1)[:n]
    p = p.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    return t, p, u, v


@jax.custom_vjp
def bvh_sweep_intersect(nbox, nmeta, tri_v0, tri_e1, tri_e2, o, d, maxt):
    """Closest-hit over a wide-leaf threaded BVH (TPU Pallas path).

    nbox: [M, 6] f32 node bboxes (lo|hi); nmeta: [M, 2] i32 (skip, payload
    with payload = start << 8 | count); tri_*: [T, 3] in BVH leaf order.
    Returns (t [N] (stays maxt on miss), prim [N] (-1 miss), u, v) — the same
    contract as render/bvh.py:bvh_intersect."""
    return _sweep_impl(nbox, nmeta, tri_v0, tri_e1, tri_e2, o, d, maxt)


def _fwd(nbox, nmeta, tri_v0, tri_e1, tri_e2, o, d, maxt):
    out = _sweep_impl(nbox, nmeta, tri_v0, tri_e1, tri_e2, o, d, maxt)
    t, p, u, v = out
    return out, (tri_v0, tri_e1, tri_e2, p, t, u, v, d, nbox, nmeta, maxt)


def _bwd(res, cts):
    """Analytic VJP (ray AND geometry cotangents) via the shared
    Moller-Trumbore adjoint (ops/intersect.py:mt_vjp), as in
    render/bvh.py:_bwd."""
    tri_v0, tri_e1, tri_e2, p, t, u, v, d, nbox, nmeta, maxt = res
    ct_t, ct_p, ct_u, ct_v = cts
    safe_p = jnp.maximum(p, 0)
    valid = p >= 0
    y = mt_vjp(tri_e1[safe_p], tri_e2[safe_p], d, ct_t, ct_u, ct_v, valid)
    vmask = valid[:, None]
    ct_v0 = jnp.zeros_like(tri_v0).at[safe_p].add(jnp.where(vmask, -y, 0.0))
    ct_e1 = jnp.zeros_like(tri_e1).at[safe_p].add(jnp.where(vmask, -u[:, None] * y, 0.0))
    ct_e2 = jnp.zeros_like(tri_e2).at[safe_p].add(jnp.where(vmask, -v[:, None] * y, 0.0))
    f0 = lambda x: np.zeros(jnp.shape(x), jax.dtypes.float0)
    return (
        jnp.zeros_like(nbox),
        f0(nmeta),
        ct_v0,
        ct_e1,
        ct_e2,
        y,
        t[:, None] * y,
        jnp.zeros_like(maxt),
    )


bvh_sweep_intersect.defvjp(_fwd, _bwd)
