"""MXU closest-hit kernel: ray/triangle intersection as one matmul.

The brute-force SMEM kernel (ops/intersect.py) is VPU-bound: ~40 vector ops
per (ray, triangle).  But Moller-Trumbore is *bilinear* in per-ray and
per-triangle quantities — every determinant it needs is a dot product of a
10-dim ray feature vector with a per-triangle column:

    feature(ray) = [ d, o x d, o, 1 ]                       (10 dims, pad 16)

    det  = e1 . (d x e2)        =  d . (e2 x e1)
    u'   = u * det              =  (o x d) . e2  -  d . (e2 x v0)
    v'   = v * det              = -(o x d) . e1  -  d . (v0 x e1)
    t'   = t * det              =  o . n - v0 . n,   n = e1 x e2

so ALL pair values come from one [R, 16] @ [16, 4T] f32 contraction that the
MXU executes at matrix speed, leaving the VPU only the epilogue (hit masks,
one reciprocal, closest-t reduction).  This is the TPU-native analog of the
reference's Embree brute-force leaf test (reference:
src/render/scene_embree.inl; the algorithm itself is the classic
Moller-Trumbore of the optix .cuh intersectors).

Scope: same as the SMEM kernel — scenes below the BVH threshold; the column
table is [16, 4*Tpad] f32 in VMEM (T <= 2048 stays under 1 MB; the [B, 4T]
pair matrix at B=512, T=2048 is 16 MB — T is capped by MAX_MXU_TRIS so both
fit VMEM comfortably).  Numerics: the contraction runs at Precision.HIGHEST
(bf16x3 passes, exact to f32 rounding here); hit tests use the same 1e-12
det guard as the VPU kernel.  maxt rides in feature slot 10 so the kernel
has a single ray operand.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_RAYS = 1024   # ROWS=8: Pallas requires >=8 sublanes per output block
ROWS = BLOCK_RAYS // 128
K_FEAT = 16            # 10 geometry dims + maxt + pad, to a sublane multiple
MAX_MXU_TRIS = 512     # [B, 4T] epilogue block: 1024*2048*4B = 8 MB VMEM


def build_mxu_cols(tri_v0, tri_e1, tri_e2):
    """Column table [K_FEAT, 4*Tpad] from triangle arrays [T, 3].

    Plain jnp (differentiable): under the custom-vjp-free debug path vertex
    gradients would flow through the table into the matmul; the production
    wrapper supplies the analytic VJP of ops/intersect.mt_vjp instead."""
    n = jnp.cross(tri_e1, tri_e2)                    # [T, 3]
    det_d = jnp.cross(tri_e2, tri_e1)                # = -n
    u_oxd = tri_e2
    u_d = -jnp.cross(tri_e2, tri_v0)
    v_oxd = -tri_e1
    v_d = -jnp.cross(tri_v0, tri_e1)
    t_o = n
    t_c = -jnp.sum(tri_v0 * n, axis=-1, keepdims=True)

    T = tri_v0.shape[0]
    z3 = jnp.zeros((T, 3), jnp.float32)
    z1 = jnp.zeros((T, 1), jnp.float32)
    zpad = jnp.zeros((T, K_FEAT - 10), jnp.float32)
    # feature layout: [d(0:3), oxd(3:6), o(6:9), 1(9), maxt(10), pad]
    det_col = jnp.concatenate([det_d, z3, z3, z1, zpad], axis=-1)
    u_col = jnp.concatenate([u_d, u_oxd, z3, z1, zpad], axis=-1)
    v_col = jnp.concatenate([v_d, v_oxd, z3, z1, zpad], axis=-1)
    t_col = jnp.concatenate([z3, z3, t_o, t_c, zpad], axis=-1)

    tpad = (-T) % 128
    if tpad:
        pz = jnp.zeros((tpad, K_FEAT), jnp.float32)
        det_col = jnp.concatenate([det_col, pz], 0)
        u_col = jnp.concatenate([u_col, pz], 0)
        v_col = jnp.concatenate([v_col, pz], 0)
        t_col = jnp.concatenate([t_col, pz], 0)
    # quantity-major groups along the lane axis: [det | u' | v' | t']
    cols = jnp.concatenate([det_col, u_col, v_col, t_col], axis=0)  # [4Tp, K]
    return cols.T                                                   # [K, 4Tp]


def _kernel(cols_ref, feat_ref, t_out, p_out, u_out, v_out, *, n_tri_pad):
    feat = feat_ref[...]                              # [B, K]
    prod = jax.lax.dot_general(
        feat, cols_ref[...],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                  # [B, 4*Tp]
    B = feat.shape[0]
    Tp = n_tri_pad
    det = prod[:, 0 * Tp:1 * Tp]
    up = prod[:, 1 * Tp:2 * Tp]
    vp = prod[:, 2 * Tp:3 * Tp]
    tp = prod[:, 3 * Tp:4 * Tp]
    maxt = feat[:, 10:11]                              # [B, 1]

    ok_det = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
    u = up * inv_det
    v = vp * inv_det
    t = tp * inv_det
    hit = (
        ok_det
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > 0.0) & (t < maxt)
    )
    t_m = jnp.where(hit, t, jnp.inf)
    best_t = jnp.min(t_m, axis=1)                      # [B]
    idx = jnp.argmin(t_m, axis=1).astype(jnp.int32)    # [B]
    found = best_t < jnp.inf
    one_hot = jax.lax.broadcasted_iota(jnp.int32, (B, Tp), 1) == idx[:, None]
    best_u = jnp.sum(jnp.where(one_hot, u, 0.0), axis=1)
    best_v = jnp.sum(jnp.where(one_hot, v, 0.0), axis=1)

    t_out[...] = jnp.where(found, best_t, jnp.inf).reshape(ROWS, 128)
    p_out[...] = jnp.where(found, idx, -1).reshape(ROWS, 128)
    u_out[...] = jnp.where(found, best_u, 0.0).reshape(ROWS, 128)
    v_out[...] = jnp.where(found, best_v, 0.0).reshape(ROWS, 128)


def mxu_intersect(cols, o, d, maxt):
    """Closest-hit over the MXU column table.

    cols: [K_FEAT, 4*Tpad] from build_mxu_cols
    o, d: [N, 3]; maxt: [N] (<=0 disables a lane)
    Returns (t [N] (inf on miss), prim [N] int32 (-1 on miss), u [N], v [N])
    — the ops/intersect.tri_intersect contract."""
    n = o.shape[0]
    n_tri_pad = cols.shape[1] // 4
    pad = (-n) % BLOCK_RAYS
    npad = n + pad
    oxd = jnp.cross(o, d)
    feat = jnp.concatenate(
        [d, oxd, o, jnp.ones((n, 1), jnp.float32), maxt[:, None],
         jnp.zeros((n, K_FEAT - 11), jnp.float32)], axis=-1
    )
    if pad:
        feat = jnp.concatenate([feat, jnp.zeros((pad, K_FEAT), jnp.float32)])

    grid = (npad // BLOCK_RAYS,)
    interpret = jax.default_backend() == "cpu"
    out_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, p, u, v = pl.pallas_call(
        partial(_kernel, n_tri_pad=n_tri_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K_FEAT, cols.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_RAYS, K_FEAT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((npad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((npad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((npad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((npad // 128, 128), jnp.float32),
        ],
        interpret=interpret,
    )(cols, feat)
    return (
        t.reshape(-1)[:n], p.reshape(-1)[:n],
        u.reshape(-1)[:n], v.reshape(-1)[:n],
    )
