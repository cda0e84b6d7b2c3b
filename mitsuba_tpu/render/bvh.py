"""Stackless threaded-BVH traversal (consumer of the native binned-SAH
builder, native/src/bvh.cpp; the TPU replacement for Embree/kd-tree traversal,
reference: src/render/scene_embree.inl, include/mitsuba/render/kdtree.h).

The threaded layout stores a skip (miss) link per node, so wavefront traversal
is a single lax.while_loop with one [N] node pointer per lane and no stack:

    hit bbox + internal -> next = node + 1
    hit bbox + leaf     -> intersect <= 8 prims, next = skip
    miss                -> next = skip

All lanes advance together; gathers are the per-step cost (O(depth) instead of
the brute-force O(T) sweep), which is what makes >SMEM-size meshes viable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bvh_intersect(
    bvh_lo, bvh_hi, bvh_skip, bvh_payload, tri_v0, tri_e1, tri_e2,
    o, d, maxt, max_steps=4096,
):
    """Closest-hit over a threaded BVH.

    Returns (t [N] (remains maxt on miss), prim [N] (-1 miss), u, v)."""
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)

    state = dict(
        node=jnp.zeros((n,), jnp.int32),
        best_t=maxt,
        best_p=jnp.full((n,), -1, jnp.int32),
        best_u=jnp.zeros((n,), jnp.float32),
        best_v=jnp.zeros((n,), jnp.float32),
        alive=maxt > 0.0,
        steps=jnp.asarray(0, jnp.int32),
    )

    def cond(s):
        return jnp.any(s["alive"] & (s["node"] >= 0)) & (s["steps"] < max_steps)

    def body(s):
        node = jnp.maximum(s["node"], 0)
        lo = bvh_lo[node]
        hi = bvh_hi[node]
        skip = bvh_skip[node]
        payload = bvh_payload[node]

        # slab test against the current best_t
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit_box = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < s["best_t"])

        # wide-leaf payload: start << 8 | count (native/src/bvh.cpp,
        # mtpu_build_bvh_wide)
        is_leaf = payload != 0
        start = payload >> 8
        count = payload & 0xFF

        do_leaf = s["alive"] & (s["node"] >= 0) & hit_box & is_leaf

        def leaf_tri(j, carry):
            bt, bp, bu, bv = carry
            pid = start + j
            in_leaf = do_leaf & (j < count)
            pid_safe = jnp.clip(pid, 0, tri_v0.shape[0] - 1)
            v0 = tri_v0[pid_safe]
            e1 = tri_e1[pid_safe]
            e2 = tri_e2[pid_safe]
            pvec = jnp.cross(d, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
            tvec = o - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(d * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            hit = (
                in_leaf & (jnp.abs(det) > 1e-12)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > 0.0) & (t < bt)
            )
            bt = jnp.where(hit, t, bt)
            bp = jnp.where(hit, pid, bp)
            bu = jnp.where(hit, u, bu)
            bv = jnp.where(hit, v, bv)
            return bt, bp, bu, bv

        from ..ops.bvh_sweep import MAX_WIDE_LEAF

        n_leaf = jnp.max(jnp.where(do_leaf, count, 0))
        n_leaf = jnp.minimum(n_leaf, MAX_WIDE_LEAF)
        bt, bp, bu, bv = jax.lax.fori_loop(
            0, n_leaf, leaf_tri,
            (s["best_t"], s["best_p"], s["best_u"], s["best_v"]),
        )

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, node + 1, skip)
        nxt = jnp.where(s["node"] < 0, s["node"], nxt)
        return dict(
            node=nxt, best_t=bt, best_p=bp, best_u=bu, best_v=bv,
            alive=s["alive"], steps=s["steps"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["best_t"], out["best_p"], out["best_u"], out["best_v"]


@jax.custom_vjp
def bvh_intersect_ad(bvh_lo, bvh_hi, bvh_skip, bvh_payload, tri_v0, tri_e1, tri_e2, o, d, maxt):
    """bvh_intersect with the same analytic ray-derivative VJP as the Pallas
    kernel (ops/intersect.py): while_loop is not tape-differentiable, and the
    intersection derivative w.r.t. the ray is known in closed form."""
    return bvh_intersect(bvh_lo, bvh_hi, bvh_skip, bvh_payload, tri_v0, tri_e1, tri_e2, o, d, maxt)


def _fwd(bvh_lo, bvh_hi, bvh_skip, bvh_payload, tri_v0, tri_e1, tri_e2, o, d, maxt):
    out = bvh_intersect(bvh_lo, bvh_hi, bvh_skip, bvh_payload, tri_v0, tri_e1, tri_e2, o, d, maxt)
    t, p, u, v = out
    res = (bvh_lo, bvh_hi, bvh_skip, bvh_payload, tri_v0, tri_e1, tri_e2, p, t, u, v, d, maxt)
    return out, res


def _bwd(res, cts):
    """Full analytic VJP (ray AND geometry cotangents) via the shared
    Möller-Trumbore adjoint (ops/intersect.py:mt_vjp); geometry cotangents
    scatter-add into the per-triangle arrays, flowing back to the vertex
    buffer through Geometry.refresh()."""
    import numpy as np

    from ..ops.intersect import mt_vjp

    bvh_lo, bvh_hi, bvh_skip, bvh_payload, tri_v0, tri_e1, tri_e2, p, t, u, v, d, maxt = res
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
        jnp.zeros_like(bvh_lo),
        jnp.zeros_like(bvh_hi),
        f0(bvh_skip),
        f0(bvh_payload),
        ct_v0,
        ct_e1,
        ct_e2,
        y,
        t[:, None] * y,
        jnp.zeros_like(maxt),
    )


bvh_intersect_ad.defvjp(_fwd, _bwd)
