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

Measured negative results (kept for the record, 200k-tri bench, v5e):
unrolled/predicated window walks and a register-resident cummax visit
computation were each within noise or slower (the kernel is VPU-instruction
-bound, not walk-latency-bound); a Baldwin–Weber tile (plane + barycentric
row forms, ~25% fewer ops on paper) lowered to ~20% SLOWER code than the
Möller–Trumbore tile (worse fma/broadcast mix); leaf widths 16/32/128 and
NWIN 16/64 all lost to the 64/32 defaults.

Round-5 negative results (scripts/bench_ablate.py decomposition; sorted-
incoherent 2^18-ray launches, full = 78-86 ms):
  * at-append DMA starts with RING == LFLUSH per-leaf slots (start each
    leaf's copy the moment the scalar walk lists it): 3.35 -> 3.06 Mrays/s
    — slower, and LFLUSH 4/8/16 within noise of each other;
  * 8-tris-per-row PACKED HBM table (4.6 KB instead of 36.9 KB per leaf
    window): Mosaic cannot shape-cast [1, 128] lanes into [8, 16] sublanes,
    and the exact one-hot-MXU unpack replacement ran 26x slower (tiny
    serialized matmuls breaking the VPU pipeline); a [T, 16] HBM table is
    silently lane-padded to [T, 128] anyway, so there is no compact layout;
  * wait-all-then-sweep-all flush ordering: no change.
Decomposition mystery, documented for the next attempt: `dmaonly` (real
walk + starts + waits, sweeps skipped) costs only ~4.6 ms over `nosweep`,
and `nodma` (sweeps on stale buffers, no DMA) runs 24 ms — yet the full
kernel runs 81-86 ms.  The parts sum to well under the whole; the residual
~50 ms only appears when real DMA data feeds the sweeps, so the suspected
cost is Mosaic scheduling around the DMA-written leaf_buf (nodma's stale
buffer is loop-invariant and its sweep code likely collapses under CSE,
making that ablation an underestimate).  scripts/roofline_bvh.py carries
the speed-of-light model these numbers are judged against.

Round-5 follow-up (the residual is NOT DMA scheduling): staging every leaf
window through a non-DMA VMEM scratch before sweeping (MI_BVH_STAGE=1, kept
in-tree as the documented experiment — it also shrinks the RING-specialized
sweep bodies 4x) measured 3.32 vs 3.35 Mrays/s baseline: a wash, refuting
the Mosaic-ordering-around-DMA-buffers hypothesis.  Ring-depth sweep:
RING=8 3.26, RING=4 3.35, RING=2 3.40, STAGE+RING=2 3.36 — all within
+/-2% noise, so the kernel is neither DMA-latency- nor code-size-bound.
Elimination leaves genuine VPU sweep work + per-leaf mask-branch sequencer
overhead as the cost; the next structural lever would be sweeping multiple
listed leaves' windows as one fused wider tile (amortizing the per-row
branch scaffolding), not more DMA tuning.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import mt_vjp

import os

BLOCK_ROWS = 8
LANES = 128
BLOCK = BLOCK_ROWS * LANES
# builder leaf width (must match the build_bvh_wide call in render/shapes.py;
# payload packs count in 8 bits, so <= 255).  Env-tunable for benchmarking.
MAX_WIDE_LEAF = int(os.environ.get("MI_BVH_LEAF", "64"))
INT_BIG = 0x7FFFFFF0    # sentinel for the prim-id argmin select


WBUF = MAX_WIDE_LEAF + 8       # 8-aligned leaf DMA window, rows
# traversal window: nodes slab-tested per batch (A/B'd 8/16/32 on a 200k-tri
# mesh: 32 best for incoherent wavefronts, equal for primary tiles)
NWIN = int(os.environ.get("MI_BVH_NWIN", "32"))
# leaf-list capacity between sweep flushes
LFLUSH = int(os.environ.get("MI_BVH_LFLUSH", "16"))
# bench-only ablation: "nosweep" skips leaf sweeps (wrong results; isolates
# window-test + walk cost), "nodma" sweeps stale buffers without DMA waits
ABLATE = os.environ.get("MI_BVH_ABLATE", "")
# stage leaf windows through a non-DMA VMEM scratch before sweeping (tests
# whether Mosaic's ordering around the DMA-written ring buffer is the
# decomposition residual; also collapses the RING-specialized sweep bodies
# into one, shrinking kernel code 4x)
STAGE = os.environ.get("MI_BVH_STAGE", "0") == "1"
# leaf-DMA ring depth (in-flight copies; latency hiding beyond double-buffer)
RING = int(os.environ.get("MI_BVH_RING", "4"))


def _kernel(T_pad, anyhit, nbox_ref, nmeta_ref, tri_ref,
            ox, oy, oz, dx, dy, dz, mt,
            t_out, p_out, u_out, v_out,
            leaf_buf, leaf_pl, leaf_rm, rmask, sweep_buf, leaf_sem):
    """Windowed block traversal with interleaved chunked sweeps and per-ROW
    (128-lane sublane row) hit masks.

    The while_loop's per-iteration scalar sync (~500 cycles measured) made
    one-node-per-step traversal the bottleneck, so each iteration:

      1. slab-tests a WINDOW of NWIN consecutive DFS-order nodes against the
         whole [8, 128] ray block (vector work only), reducing each node's
         hits to an 8-bit ROW mask (lane-max of 1<<row, then a sublane sum
         that ORs the distinct powers) stored in SMEM;
      2. walks the window's masks with pure scalar ops (SMEM skip links),
         appending hit leaves AND their row masks to small SMEM lists;
      3. when the list fills (LFLUSH) or traversal ends, sweeps the listed
         leaves with double-buffered DMA of their [WBUF, 128] HBM windows —
         sweeping ONLY the rows whose mask bit is set.  For incoherent
         (bounce/shadow) wavefronts a leaf is typically needed by ~1.1 of
         the block's 8 rows (measured, 200k-tri mesh), so row gating cuts
         the dominant sweep cost ~7x while keeping ONE shared scalar walk.
         Sweeps update the output refs, so later windows prune against the
         tightened best-t.
    """
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
    # hoisted slab-test terms: (lo - o) * inv == lo * inv - o * inv
    oi_x = o_x * inv_dx
    oi_y = o_y * inv_dy
    oi_z = o_z * inv_dz

    t_out[...] = maxt
    p_out[...] = jnp.full(o_x.shape, -1, jnp.int32)
    u_out[...] = jnp.zeros(o_x.shape, jnp.float32)
    v_out[...] = jnp.zeros(o_x.shape, jnp.float32)

    tri_ids8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    n_nodes = nmeta_ref.shape[0] // 2

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0)
    row_pow = jnp.int32(1) << row_ids          # hoisted out of the node loop

    def _leaf_copy(i, slot):
        start = leaf_pl[i] >> 8
        w8 = (start >> 3) << 3
        return pltpu.make_async_copy(
            tri_ref.at[pl.ds(w8, WBUF), :],
            leaf_buf.at[slot],
            leaf_sem.at[slot],
        )

    def _sweep_leaf(i, slot):
        """Moller-Trumbore over one DMA-resident leaf; updates output refs.
        Only the rows named by the leaf's SMEM row mask are swept (a leaf is
        typically needed by ~1 of 8 rows on incoherent wavefronts).  The
        chunk loop is UNROLLED with static scratch slices and the ring slot
        is specialized by a scalar branch: dynamic sublane offsets and
        per-chunk ref round-trips both measured ~2x slower (relayouts /
        lost register allocation)."""
        payload = leaf_pl[i]
        rm = leaf_rm[i]
        start = payload >> 8
        count = payload & 0xFF
        w8 = (start >> 3) << 3

        def _rows(fetch_chunk):
            for r in range(BLOCK_ROWS):
                @pl.when(((rm >> r) & 1) == 1)
                def _row(r=r):
                    o_xr = o_x[r : r + 1, :]
                    o_yr = o_y[r : r + 1, :]
                    o_zr = o_z[r : r + 1, :]
                    d_xr = d_x[r : r + 1, :]
                    d_yr = d_y[r : r + 1, :]
                    d_zr = d_z[r : r + 1, :]
                    carry = (
                        t_out[r : r + 1, :], p_out[r : r + 1, :],
                        u_out[r : r + 1, :], v_out[r : r + 1, :],
                    )
                    for j in range(WBUF // 8):
                        carry = _mt_chunk(
                            w8 + 8 * j, start, count,
                            fetch_chunk(j),
                            o_xr, o_yr, o_zr, d_xr, d_yr, d_zr,
                            *carry,
                        )
                    bt_r, bp_r, bu_r, bv_r = carry
                    t_out[r : r + 1, :] = bt_r
                    p_out[r : r + 1, :] = bp_r
                    u_out[r : r + 1, :] = bu_r
                    v_out[r : r + 1, :] = bv_r

        if STAGE:
            # decouple the VPU sweep from the DMA-written ring buffer: one
            # bulk copy into a plain scratch, then a single slot-independent
            # sweep body
            for slot_val in range(RING):
                @pl.when(slot == slot_val)
                def _copy(slot_val=slot_val):
                    sweep_buf[...] = leaf_buf[slot_val]
            _rows(lambda j: sweep_buf[8 * j : 8 * j + 8, 0:16])
        else:
            for slot_val in range(RING):
                @pl.when(slot == slot_val)
                def _slot(slot_val=slot_val):
                    _rows(lambda j: leaf_buf[slot_val, 8 * j : 8 * j + 8, 0:16])

    def _mt_chunk(g, start, count, chunk,
                  o_xr, o_yr, o_zr, d_xr, d_yr, d_zr,
                  bt_r, bp_r, bu_r, bv_r):
        """One 8-triangle x 128-ray Moller-Trumbore outer-product tile;
        closest-hit reduces over the triangle sublane axis and returns the
        tightened row state."""
        v0x = chunk[:, 0:1]
        v0y = chunk[:, 1:2]
        v0z = chunk[:, 2:3]
        e1x = chunk[:, 3:4]
        e1y = chunk[:, 4:5]
        e1z = chunk[:, 5:6]
        e2x = chunk[:, 6:7]
        e2y = chunk[:, 7:8]
        e2z = chunk[:, 8:9]
        pid = g + tri_ids8
        tri_ok = (pid >= start) & (pid < start + count)

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
        hitt = (
            tri_ok
            & (jnp.abs(det) > 1e-12)
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > 0.0) & (tt < bt_r)
        )
        tt = jnp.where(hitt, tt, jnp.inf)
        tmin_r = jnp.min(tt, axis=0, keepdims=True)
        improved = tmin_r < bt_r
        selm = tt == tmin_r
        pid_r = jnp.min(jnp.where(selm, pid, INT_BIG), axis=0, keepdims=True)
        u_r = jnp.min(jnp.where(selm, uu, jnp.inf), axis=0, keepdims=True)
        v_r = jnp.min(jnp.where(selm, vv, jnp.inf), axis=0, keepdims=True)

        if anyhit:
            # occlusion query: first hit wins; -inf best-t kills every later
            # box test for that ray, so the walk footprint collapses as rays
            # resolve
            tmin_r = jnp.full_like(tmin_r, -jnp.inf)
        return (
            jnp.where(improved, tmin_r, bt_r),
            jnp.where(improved, pid_r, bp_r),
            jnp.where(improved, u_r, bu_r),
            jnp.where(improved, v_r, bv_r),
        )

    def cond(s):
        node, nl = s
        return (node >= 0) | (nl > 0)

    def body(s):
        node, nl = s

        # -- 1. batched window test: nodes [node, node+NWIN) ----------------
        # each node's [8, 128] hit mask reduces to 8 ROW bits: lane-max of
        # (hit ? 1<<row : 0) then a sublane sum (rows carry distinct powers
        # of two, so + is |); stored per-node in SMEM for the walk + sweeps
        w0 = jnp.maximum(node, 0)
        bt = t_out[...]
        for k in range(NWIN):
            nk = jnp.minimum(w0 + k, n_nodes - 1)
            nb = nk * 6
            lo_x = nbox_ref[nb]
            lo_y = nbox_ref[nb + 1]
            lo_z = nbox_ref[nb + 2]
            hi_x = nbox_ref[nb + 3]
            hi_y = nbox_ref[nb + 4]
            hi_z = nbox_ref[nb + 5]
            tx0 = lo_x * inv_dx - oi_x
            tx1 = hi_x * inv_dx - oi_x
            ty0 = lo_y * inv_dy - oi_y
            ty1 = hi_y * inv_dy - oi_y
            tz0 = lo_z * inv_dz - oi_z
            tz1 = hi_z * inv_dz - oi_z
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            hit_k = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt)
            rowbits = jnp.where(hit_k, row_pow, 0)
            rmask[k] = jnp.sum(jnp.max(rowbits, axis=1))

        # -- 2. scalar walk of the window ----------------------------------
        # (measured negative result, kept for the record: replacing this
        # data-dependent while_loop with NWIN unrolled predicated scalar
        # steps was ~12% SLOWER on incoherent wavefronts — the predicated
        # SMEM stores + always-executed step bodies cost more than the
        # loop's per-iteration sync.  Leaf width 16/32/128 and NWIN 16/64
        # also all measured slower than the 64/32 defaults on the 200k-tri
        # bench; the kernel is at its design optimum — remaining waste is
        # intrinsic to 128-lane row granularity under ray divergence.)
        def wcond(ws):
            cur, wnl = ws
            return (cur >= 0) & (cur < w0 + NWIN) & (wnl < LFLUSH)

        def wbody(ws):
            cur, wnl = ws
            rm = rmask[cur - w0]
            b = rm != 0
            payload = nmeta_ref[2 * cur + 1]
            skip = nmeta_ref[2 * cur]
            is_leaf = payload != 0
            take = b & is_leaf

            @pl.when(take)
            def _rec():
                leaf_pl[wnl] = payload
                leaf_rm[wnl] = rm

            nxt = jnp.where(b & jnp.logical_not(is_leaf), cur + 1, skip)
            return nxt, wnl + take.astype(jnp.int32)

        node, nl = jax.lax.while_loop(wcond, wbody, (node, nl))

        # -- 3. flush: sweep the listed leaves, double-buffered DMA ---------
        flush = (nl >= LFLUSH) | ((node < 0) & (nl > 0))

        @pl.when(flush & (ABLATE != "nosweep"))
        def _flush():
            # RING-deep prefetch: keep RING-1 leaf copies in flight so the
            # per-leaf DMA latency overlaps the sweeps of earlier leaves
            if ABLATE != "nodma":
                for r0 in range(RING - 1):
                    @pl.when(r0 < nl)
                    def _pf0(r0=r0):
                        _leaf_copy(jnp.int32(r0), jnp.int32(r0)).start()

            def sweep_i(i, carry):
                slot = jax.lax.rem(i, RING)
                if ABLATE != "nodma":
                    _leaf_copy(i, slot).wait()

                    @pl.when(i + RING - 1 < nl)
                    def _prefetch():
                        _leaf_copy(
                            i + RING - 1, jax.lax.rem(i + RING - 1, RING)
                        ).start()

                _sweep_leaf(i, slot)
                return carry

            jax.lax.fori_loop(0, nl, sweep_i, jnp.int32(0))

        nl = jnp.where(flush, 0, nl)
        return node, nl

    jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))


def _pallas_bvh_sweep(nbox, nmeta, tri16, ox, oy, oz, dx, dy, dz, mt, anyhit=False):
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
    M6 = nbox.shape[0]
    return pl.pallas_call(
        partial(_kernel, T_pad, anyhit),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M6,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((M6 // 3,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),        # tri table stays in HBM
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((RING, WBUF, 128), jnp.float32),
            pltpu.SMEM((LFLUSH,), jnp.int32),     # leaf payloads
            pltpu.SMEM((LFLUSH,), jnp.int32),     # leaf row masks
            pltpu.SMEM((NWIN,), jnp.int32),       # window row masks
            pltpu.VMEM((WBUF, 128), jnp.float32),  # STAGE sweep scratch
            pltpu.SemaphoreType.DMA((RING,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nbox, nmeta, tri16, ox, oy, oz, dx, dy, dz, mt)


def _sweep_impl(nbox, nmeta, tri_v0, tri_e1, tri_e2, o, d, maxt, anyhit=False):
    n = o.shape[0]
    nbox = nbox.reshape(-1)          # flat SMEM layout (see _kernel comment)
    nmeta = nmeta.reshape(-1)
    T = tri_v0.shape[0]
    T_pad = ((T + MAX_WIDE_LEAF + 15) // 8) * 8  # spare rows: leaf DMA window stays in bounds
    # lanes padded 16 -> 128: HBM DMA slices need full-lane rows; attrs live
    # in lanes 0:16 (8x HBM bloat, but the table never touches VMEM whole)
    tri16 = jnp.zeros((T_pad, 128), jnp.float32)
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

    t, p, u, v = _pallas_bvh_sweep(nbox, nmeta, tri16, ox, oy, oz, dx, dy, dz, mt, anyhit)
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


def ray_sort_key(o, d, bbox_lo, bbox_hi, maxt=None):
    """u32 coherence sort key: morton(origin, 6 bits/axis) high bits ++
    morton(direction, 4 bits/axis) low bits.  Shared-origin wavefronts
    (primary rays) order by direction — image-space tiles; scattered
    wavefronts (bounces, shadow rays) group spatially first.

    With `maxt` given, a root-bbox cull bit is prepended ABOVE the morton
    bits: rays that cannot hit the scene bbox (miss the root slab test, or
    are inactive with maxt = -inf) sort to the tail of the wavefront.  On
    incoherent bounce/shadow wavefronts most rays miss the mesh entirely
    (measured ~0.5 leaf visits/ray on the 200k-tri bench) — packing them
    into trailing blocks lets those blocks terminate after a single window
    test in the traversal kernel, and packs the surviving rays densely so
    each active block's node-union footprint is shared by more real work."""
    ext = jnp.maximum(bbox_hi - bbox_lo, 1e-6)
    qo = jnp.clip(((o - bbox_lo) / ext * 64.0).astype(jnp.int32), 0, 63)
    qd = jnp.clip(((d * 0.5 + 0.5) * 16.0).astype(jnp.int32), 0, 15)

    def morton3(v, bits):
        out = jnp.zeros(v.shape[:-1], jnp.int32)
        for b in range(bits):
            out = out | (((v[..., 0] >> b) & 1) << (3 * b + 2))
            out = out | (((v[..., 1] >> b) & 1) << (3 * b + 1))
            out = out | (((v[..., 2] >> b) & 1) << (3 * b))
        return out

    key = (morton3(qo, 6) << 12) | morton3(qd, 4)
    if maxt is not None:
        eps = 1e-12
        inv = 1.0 / jnp.where(jnp.abs(d) < eps,
                              jnp.where(d >= 0, eps, -eps), d)
        t0 = (bbox_lo - o) * inv
        t1 = (bbox_hi - o) * inv
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        miss = ~((jnp.minimum(tmax, maxt) >= jnp.maximum(tmin, 0.0)))
        key = key | (miss.astype(jnp.int32) << 30)
    return key


def maybe_sort_order(key):
    """Runtime-conditional coherence sort.

    The block-traversal kernel wants 1024-lane blocks with small spatial
    footprint.  Primary wavefronts already have that (tiled lane order), and
    the XLA argsort of ~1M keys costs ~40% of a coherent closest-hit — so
    sort only when the wavefront is measurably block-incoherent.  The
    statistic is the mean per-1024-block key spread relative to the global
    spread; the identity permutation is returned for coherent wavefronts.
    Results are permutation-invariant (closest hit + exact scatter-back),
    so the branch never changes a rendered sample."""
    n = key.shape[0]
    nb = max(n // BLOCK, 1)
    kb = key[: nb * BLOCK].reshape(nb, -1)
    spread = jnp.mean((jnp.max(kb, 1) - jnp.min(kb, 1)).astype(jnp.float32))
    glob = (jnp.max(key) - jnp.min(key)).astype(jnp.float32)
    need = spread > 0.08 * jnp.maximum(glob, 1.0)
    return jax.lax.cond(
        need,
        lambda k: jnp.argsort(k).astype(jnp.int32),
        lambda k: jnp.arange(n, dtype=jnp.int32),
        key,
    )


def bvh_sweep_occluded(nbox, nmeta, tri_v0, tri_e1, tri_e2, o, d, maxt):
    """Any-hit occlusion query over the wide-leaf BVH (shadow rays;
    reference: Scene::ray_test / scene_optix.inl any-hit programs).
    Returns occluded [N] bool.  Non-differentiable by construction (the
    visibility indicator's a.e.-zero derivative is dropped, as in the
    reference's ray_test)."""
    t, p, u, v = _sweep_impl(
        jax.lax.stop_gradient(nbox), jax.lax.stop_gradient(nmeta),
        jax.lax.stop_gradient(tri_v0), jax.lax.stop_gradient(tri_e1),
        jax.lax.stop_gradient(tri_e2), jax.lax.stop_gradient(o),
        jax.lax.stop_gradient(d), jax.lax.stop_gradient(maxt), anyhit=True,
    )
    return p >= 0
