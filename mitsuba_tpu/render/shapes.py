"""Shape geometry: host-side build + device intersection kernels.

TPU-native replacement for the reference's Shape/Mesh + 3 ray-tracing backends
(reference: src/render/scene_embree.inl, kdtree.h, scene_optix.inl;
src/shapes/{rectangle,cube,sphere,obj,ply}.cpp).

Design: all shapes in a scene are compiled into two dense SoA primitive
tables — triangles (rect=2 tris, cube=12, meshes as-is) and analytic spheres.
Intersection is a chunked scan over primitives with a running closest-hit
reduction: dense, branch-free, bounded-memory — the right shape for the VPU
at the primitive counts of the acceptance scenes.  A Pallas BVH kernel slots
in behind the same interface for large meshes (mitsuba_tpu/ops).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..core.frame import cross, dot, normalize, coordinate_system
from ..core.math import RAY_EPSILON, lookup_rows
from .records import PreliminaryIntersection, Ray, SurfaceInteraction

TRI_CHUNK = 64


@struct.dataclass
class Geometry:
    """Flattened scene geometry.  Primitive ids: [0, n_tris) are triangles,
    [n_tris, n_tris + n_spheres) spheres, then n_capsules capsule segments,
    then the SDF grid.

    `vertices` is the differentiable source of truth for triangle geometry
    (the analog of the reference's Differentiable|Discontinuous mesh
    `vertex_positions`, src/render/mesh.cpp:84-91): the per-triangle tables
    tri_v0/e1/e2/ng/vn are *derived* from it by `refresh()`, which runs
    inside every jitted render pass so gradients flow back to the vertex
    buffer."""

    vertices: jnp.ndarray    # [V, 3] concatenated per-mesh vertex buffer
    vertex_normals: jnp.ndarray  # [V, 3] explicit per-vertex normals (zeros if none)
    tri_face: jnp.ndarray    # [T, 3] int32 vertex indices (padding: all 0)
    tri_v0: jnp.ndarray      # [T, 3]
    tri_e1: jnp.ndarray      # [T, 3] v1 - v0
    tri_e2: jnp.ndarray      # [T, 3] v2 - v0
    tri_ng: jnp.ndarray      # [T, 3] unit geometric normal
    tri_vn: jnp.ndarray      # [T, 3, 3] per-vertex shading normals
    tri_uv: jnp.ndarray      # [T, 3, 2] per-vertex uv
    tri_shape: jnp.ndarray   # [T] int32
    sph_center: jnp.ndarray  # [S, 3]
    sph_radius: jnp.ndarray  # [S]
    sph_shape: jnp.ndarray   # [S] int32
    # analytic capsules (swept spheres of line segments) — the EXACT
    # geometry of `linearcurve` chains and of `bsplinecurve` polylines
    # (reference: src/shapes/{linearcurve,bsplinecurve}.cpp intersect round
    # cross-sections analytically; the r2-r4 triangle-tube tessellation gave
    # faceted silhouettes).  Radius is constant per segment (the mean of the
    # segment's endpoint radii — exact for untapered fibers, first-order for
    # tapered ones after resampling).
    cap_a: jnp.ndarray       # [K, 3] segment start
    cap_b: jnp.ndarray       # [K, 3] segment end
    cap_r: jnp.ndarray       # [K]
    cap_shape: jnp.ndarray   # [K] int32 (-1 pad)
    # signed-distance-field grid shape (reference: src/shapes/sdfgrid.cpp):
    # one grid per scene for now; values on [0,1]^3 nodes, sphere-traced.
    # sdf_data is a DIFFERENTIABLE scene parameter (hit t couples to the
    # grid through the implicit function theorem in _sdf_trace).
    sdf_data: jnp.ndarray    # [D, H, W] ([1,1,1] zeros if absent)
    sdf_to_local: jnp.ndarray  # [4, 4] world -> grid space
    sdf_shape: jnp.ndarray   # [] int32 shape index (-1 if absent)
    # threaded BVH (native binned-SAH build; see native/src/bvh.cpp) — only
    # populated for scenes beyond the SMEM brute-force size
    bvh_lo: jnp.ndarray      # [M, 3]
    bvh_hi: jnp.ndarray      # [M, 3]
    bvh_skip: jnp.ndarray    # [M] int32
    bvh_payload: jnp.ndarray  # [M] int32
    # unique mesh edges for silhouette sampling (projective gradients;
    # reference: Shape silhouette API, include/mitsuba/render/shape.h)
    edge_v: jnp.ndarray      # [E, 2] int32 endpoint vertex indices
    edge_f: jnp.ndarray      # [E, 2] int32 adjacent face (tri) indices, -1 open
    edge_shape: jnp.ndarray  # [E] int32 shape index (-1 for the empty pad row)
    n_tris: int = struct.field(pytree_node=False)
    n_spheres: int = struct.field(pytree_node=False)
    has_vertex_normals: bool = struct.field(pytree_node=False)
    n_sdfs: int = struct.field(pytree_node=False, default=0)
    has_bvh: bool = struct.field(pytree_node=False, default=False)
    n_capsules: int = struct.field(pytree_node=False, default=0)
    # (start, count) per mesh into `vertices`, ordered like the meshes passed
    # to build_geometry; consumed by traverse() for per-shape
    # `vertex_positions` views
    mesh_vertex_slices: tuple = struct.field(pytree_node=False, default=())

    def refresh(self):
        """Recompute the derived per-triangle tables from `vertices`
        (differentiably).  The reference analog is Mesh::parameters_changed
        recomputing face data after a vertex_positions write."""
        f = self.tri_face
        p0 = self.vertices[f[:, 0]]
        p1 = self.vertices[f[:, 1]]
        p2 = self.vertices[f[:, 2]]
        e1 = p1 - p0
        e2 = p2 - p0
        ng = jnp.cross(e1, e2)
        # double-where guard: degenerate padding triangles get a zero normal
        # with a zero (not NaN) gradient — a bare clamp still evaluates the
        # rsqrt VJP at ~0 and produces 0 * inf = NaN
        n2 = jnp.sum(ng * ng, axis=-1, keepdims=True)
        good = n2 > 1e-24
        ng = jnp.where(good, ng * jax.lax.rsqrt(jnp.where(good, n2, 1.0)), 0.0)
        if self.has_vertex_normals:
            vn = jnp.stack(
                [self.vertex_normals[f[:, k]] for k in range(3)], axis=1
            )
            # meshes without explicit normals carry zero vertex normals:
            # fall back to the face normal for those rows
            missing = jnp.sum(vn * vn, axis=-1, keepdims=True) < 1e-12
            vn = jnp.where(missing, ng[:, None, :], vn)
        else:
            vn = jnp.repeat(ng[:, None, :], 3, axis=1)
        return self.replace(tri_v0=p0, tri_e1=e1, tri_e2=e2, tri_ng=ng, tri_vn=vn)


def build_geometry(tri_meshes, spheres, sdfs=(), capsules=()):
    """Host-side geometry compile.

    tri_meshes: list of dicts {vertices [V,3], faces [F,3], shape_index,
                normals (opt) [V,3], uvs (opt) [V,2]}
    spheres: list of dicts {center, radius, shape_index}
    capsules: list of dicts {a, b, r, shape_index} — exact swept-sphere
              curve segments (see Geometry.cap_* docs)
    """
    v0s, e1s, e2s, ngs, vns, uvs, sids = [], [], [], [], [], [], []
    verts_all, vnorms_all, faces_all, vslices = [], [], [], []
    v_off = 0
    any_vn = False
    for m in tri_meshes:
        V = np.asarray(m["vertices"], np.float32)
        F = np.asarray(m["faces"], np.int32)
        verts_all.append(V)
        faces_all.append(F + v_off)
        if m.get("normals") is not None and len(m["normals"]) == len(V):
            vnorms_all.append(np.asarray(m["normals"], np.float32))
        else:
            vnorms_all.append(np.zeros_like(V))
        vslices.append((v_off, V.shape[0]))
        v_off += V.shape[0]
        p0, p1, p2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
        e1, e2 = p1 - p0, p2 - p0
        ng = np.cross(e1, e2)
        area2 = np.linalg.norm(ng, axis=-1, keepdims=True)
        ng = ng / np.maximum(area2, 1e-20)
        v0s.append(p0)
        e1s.append(e1)
        e2s.append(e2)
        ngs.append(ng)
        if m.get("normals") is not None:
            N = np.asarray(m["normals"], np.float32)
            vns.append(np.stack([N[F[:, 0]], N[F[:, 1]], N[F[:, 2]]], axis=1))
            any_vn = True
        else:
            vns.append(np.repeat(ng[:, None, :], 3, axis=1))
        if m.get("uvs") is not None:
            U = np.asarray(m["uvs"], np.float32)
            uvs.append(np.stack([U[F[:, 0]], U[F[:, 1]], U[F[:, 2]]], axis=1))
        else:
            default_uv = np.array([[0, 0], [1, 0], [1, 1]], np.float32)
            uvs.append(np.tile(default_uv[None], (F.shape[0], 1, 1)))
        sids.append(np.full((F.shape[0],), m["shape_index"], np.int32))

    def cat(lst, empty_shape):
        if lst:
            return np.concatenate(lst, axis=0)
        return np.zeros(empty_shape, np.float32)

    T = sum(x.shape[0] for x in v0s) if v0s else 0
    # pad to a chunk multiple with degenerate triangles (e1=e2=0 -> det=0, no hit)
    T_pad = max(((T + TRI_CHUNK - 1) // TRI_CHUNK) * TRI_CHUNK, TRI_CHUNK)

    def pad(x, total, fill=0.0):
        pad_n = total - x.shape[0]
        if pad_n <= 0:
            return x
        return np.concatenate(
            [x, np.full((pad_n,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    tri_v0 = pad(cat(v0s, (0, 3)), T_pad)
    tri_e1 = pad(cat(e1s, (0, 3)), T_pad)
    tri_e2 = pad(cat(e2s, (0, 3)), T_pad)
    tri_ng = pad(cat(ngs, (0, 3)), T_pad)
    tri_vn = pad(cat(vns, (0, 3, 3)), T_pad)
    tri_uv = pad(cat(uvs, (0, 3, 2)), T_pad)
    tri_shape = pad(
        np.concatenate(sids, axis=0) if sids else np.zeros((0,), np.int32), T_pad, -1
    ).astype(np.int32)
    vertices = cat(verts_all, (1, 3))
    vertex_normals = cat(vnorms_all, (1, 3))
    tri_face = pad(
        (np.concatenate(faces_all, axis=0) if faces_all else np.zeros((0, 3), np.int32)),
        T_pad, 0,
    ).astype(np.int32)

    S = len(spheres)
    sph_center = np.asarray([s["center"] for s in spheres], np.float32).reshape(S, 3) if S else np.zeros((1, 3), np.float32)
    sph_radius = np.asarray([s["radius"] for s in spheres], np.float32).reshape(S) if S else np.zeros((1,), np.float32)
    sph_shape = np.asarray([s["shape_index"] for s in spheres], np.int32).reshape(S) if S else np.full((1,), -1, np.int32)

    K = len(capsules)
    cap_a = np.asarray([c["a"] for c in capsules], np.float32).reshape(K, 3) if K else np.zeros((1, 3), np.float32)
    cap_b = np.asarray([c["b"] for c in capsules], np.float32).reshape(K, 3) if K else np.asarray([[0.0, 0.0, 1.0]], np.float32)
    cap_r = np.asarray([c["r"] for c in capsules], np.float32).reshape(K) if K else np.zeros((1,), np.float32)
    cap_shape = np.asarray([c["shape_index"] for c in capsules], np.int32).reshape(K) if K else np.full((1,), -1, np.int32)

    # large scenes: native binned-SAH BVH + leaf-order triangle reordering
    from ..ops.intersect import MAX_SMEM_TRIS

    has_bvh = T > MAX_SMEM_TRIS
    if has_bvh:
        from .. import native as native_mod

        from ..ops.bvh_sweep import MAX_WIDE_LEAF

        tris9 = np.concatenate([tri_v0[:T], tri_e1[:T], tri_e2[:T]], axis=-1)
        nodes, order = native_mod.build_bvh_wide(tris9, max_leaf=MAX_WIDE_LEAF)
        # reorder all per-tri arrays to BVH leaf order (padding tris dropped:
        # BVH paths never index beyond T)
        perm = np.concatenate([order, np.arange(T, T_pad)]).astype(np.int64)
        tri_v0 = tri_v0[perm]
        tri_e1 = tri_e1[perm]
        tri_e2 = tri_e2[perm]
        tri_ng = tri_ng[perm]
        tri_vn = tri_vn[perm]
        tri_uv = tri_uv[perm]
        tri_shape = tri_shape[perm]
        tri_face = tri_face[perm]
        bvh_lo = nodes[:, 0:3]
        bvh_hi = nodes[:, 3:6]
        bvh_skip = nodes[:, 6].view(np.int32).copy()
        bvh_payload = nodes[:, 7].view(np.int32).copy()
    else:
        bvh_lo = np.zeros((1, 3), np.float32)
        bvh_hi = np.zeros((1, 3), np.float32)
        bvh_skip = np.full((1,), -1, np.int32)
        bvh_payload = np.zeros((1,), np.int32)

    # unique-edge table (for silhouette/boundary sampling): canonical
    # (min,max) vertex pairs with up to two adjacent faces
    if T > 0:
        F = tri_face[:T]
        pairs = np.concatenate(
            [F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]], axis=0
        )
        owner = np.tile(np.arange(T, dtype=np.int32), 3)
        key_lo = pairs.min(axis=1).astype(np.int64)
        key_hi = pairs.max(axis=1).astype(np.int64)
        key = key_lo * np.int64(1 << 32) + key_hi
        order_e = np.argsort(key, kind="stable")
        key_s, owner_s = key[order_e], owner[order_e]
        uniq, start = np.unique(key_s, return_index=True)
        E = uniq.shape[0]
        f0 = owner_s[start]
        nxt = np.minimum(start + 1, key_s.shape[0] - 1)
        has2 = (key_s[nxt] == uniq) & (nxt != start)
        f1 = np.where(has2, owner_s[nxt], -1).astype(np.int32)
        edge_v = np.stack(
            [(uniq // (1 << 32)).astype(np.int32), (uniq % (1 << 32)).astype(np.int32)],
            axis=-1,
        )
        edge_f = np.stack([f0.astype(np.int32), f1], axis=-1)
        edge_shape = tri_shape[f0]
    else:
        edge_v = np.zeros((1, 2), np.int32)
        edge_f = np.full((1, 2), -1, np.int32)
        edge_shape = np.full((1,), -1, np.int32)

    return Geometry(
        vertices=jnp.asarray(vertices), vertex_normals=jnp.asarray(vertex_normals),
        tri_face=jnp.asarray(tri_face), mesh_vertex_slices=tuple(vslices),
        edge_v=jnp.asarray(edge_v), edge_f=jnp.asarray(edge_f),
        edge_shape=jnp.asarray(edge_shape),
        tri_v0=jnp.asarray(tri_v0), tri_e1=jnp.asarray(tri_e1),
        tri_e2=jnp.asarray(tri_e2), tri_ng=jnp.asarray(tri_ng),
        tri_vn=jnp.asarray(tri_vn), tri_uv=jnp.asarray(tri_uv),
        tri_shape=jnp.asarray(tri_shape),
        sph_center=jnp.asarray(sph_center), sph_radius=jnp.asarray(sph_radius),
        sph_shape=jnp.asarray(sph_shape),
        cap_a=jnp.asarray(cap_a), cap_b=jnp.asarray(cap_b),
        cap_r=jnp.asarray(cap_r), cap_shape=jnp.asarray(cap_shape),
        sdf_data=jnp.asarray(
            sdfs[0]["data"] if sdfs else np.zeros((1, 1, 1), np.float32)
        ),
        sdf_to_local=jnp.asarray(
            sdfs[0]["to_local"] if sdfs else np.eye(4, dtype=np.float32)
        ),
        sdf_shape=jnp.asarray(
            sdfs[0]["shape_index"] if sdfs else -1, jnp.int32
        ),
        bvh_lo=jnp.asarray(bvh_lo), bvh_hi=jnp.asarray(bvh_hi),
        bvh_skip=jnp.asarray(bvh_skip), bvh_payload=jnp.asarray(bvh_payload),
        n_tris=T_pad, n_spheres=S, n_sdfs=len(sdfs), has_vertex_normals=any_vn,
        has_bvh=has_bvh, n_capsules=K,
    )


# ---------------------------------------------------------------------------
# Intersection
# ---------------------------------------------------------------------------

def _intersect_tri_chunk(o, d, v0, e1, e2):
    """Moller-Trumbore, rays [N,3] x tris [CH,3] -> t,u,v,hit [N,CH]."""
    d_b = d[:, None, :]
    pvec = cross(d_b, e2[None, :, :])                    # [N,CH,3]
    det = jnp.sum(e1[None] * pvec, axis=-1)               # [N,CH]
    tvec = o[:, None, :] - v0[None]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = cross(tvec, e1[None])
    v = jnp.sum(d_b * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return t, u, v, hit


def _use_pallas(geom: Geometry) -> bool:
    """Use the Pallas closest-hit kernel on TPU for SMEM-resident scenes
    (mitsuba_tpu/ops/intersect.py); XLA chunked scan elsewhere."""
    import jax as _jax
    from ..ops.intersect import MAX_SMEM_TRIS

    return (
        _jax.default_backend() != "cpu"
        and geom.n_tris <= MAX_SMEM_TRIS
    )


def ray_intersect_preliminary(geom: Geometry, ray: Ray, active=None):
    """Closest-hit query (reference: Scene::ray_intersect_preliminary,
    src/render/scene.cpp:181-199).  On TPU, triangles go through the Pallas
    VMEM kernel; the XLA fallback is a chunked scan keeping the live
    intermediate at [N, TRI_CHUNK]."""
    N = ray.o.shape[0]
    if active is None:
        active = jnp.ones((N,), bool)

    if geom.has_bvh:
        maxt = jnp.where(active, ray.maxt, -jnp.inf)
        if jax.default_backend() != "cpu":
            # Pallas block-traversal kernel: SMEM node table + 8-tri x
            # 128-ray VPU sweep tiles (ops/bvh_sweep.py).  Rays are sorted by
            # (origin-morton, direction-morton) first so each 1024-ray block
            # covers a compact spatial tile — the block-shared traversal's
            # node-union footprint drops ~7x (measured on a 200k-tri mesh)
            from ..ops.bvh_sweep import (
                bvh_sweep_intersect, maybe_sort_order, ray_sort_key,
            )

            key = ray_sort_key(ray.o, ray.d, geom.bvh_lo[0], geom.bvh_hi[0], maxt)
            order = maybe_sort_order(key)
            inv = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0], dtype=order.dtype)
            )
            nbox = jnp.concatenate([geom.bvh_lo, geom.bvh_hi], axis=-1)
            nmeta = jnp.stack([geom.bvh_skip, geom.bvh_payload], axis=-1)
            t_b, p_b, u_b, v_b = bvh_sweep_intersect(
                nbox, nmeta, geom.tri_v0, geom.tri_e1, geom.tri_e2,
                ray.o[order], ray.d[order], maxt[order],
            )
            t_b, p_b, u_b, v_b = t_b[inv], p_b[inv], u_b[inv], v_b[inv]
        else:
            from .bvh import bvh_intersect_ad

            t_b, p_b, u_b, v_b = bvh_intersect_ad(
                geom.bvh_lo, geom.bvh_hi, geom.bvh_skip, geom.bvh_payload,
                geom.tri_v0, geom.tri_e1, geom.tri_e2, ray.o, ray.d, maxt,
            )
        best_t = jnp.where(p_b >= 0, t_b, jnp.where(active, ray.maxt, -jnp.inf))
        best_uv = jnp.stack([u_b, v_b], axis=-1)
        return _sphere_pass(geom, ray, best_t, p_b, best_uv)

    if _use_pallas(geom):
        from ..ops.intersect import build_tri_table, tri_intersect

        tri_table = build_tri_table(geom)
        n_tri = jnp.asarray([geom.n_tris], jnp.int32)
        maxt = jnp.where(active, ray.maxt, -jnp.inf)
        t_p, p_p, u_p, v_p = tri_intersect(tri_table, n_tri, ray.o, ray.d, maxt)
        best_t = jnp.where(jnp.isfinite(t_p), t_p, jnp.where(active, ray.maxt, -jnp.inf))
        best_prim = p_p
        best_uv = jnp.stack([u_p, v_p], axis=-1)
        return _sphere_pass(geom, ray, best_t, best_prim, best_uv)

    best_t = jnp.where(active, ray.maxt, -jnp.inf)  # inactive: reject all hits
    best_prim = jnp.full((N,), -1, jnp.int32)
    best_uv = jnp.zeros((N, 2), jnp.float32)

    n_chunks = geom.n_tris // TRI_CHUNK
    v0 = geom.tri_v0.reshape(n_chunks, TRI_CHUNK, 3)
    e1 = geom.tri_e1.reshape(n_chunks, TRI_CHUNK, 3)
    e2 = geom.tri_e2.reshape(n_chunks, TRI_CHUNK, 3)

    def body(carry, chunk):
        bt, bp, buv = carry
        cv0, ce1, ce2, base = chunk
        t, u, v, hit = _intersect_tri_chunk(ray.o, ray.d, cv0, ce1, ce2)
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)                       # [N]
        tj = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        closer = tj < bt
        bt = jnp.where(closer, tj, bt)
        bp = jnp.where(closer, base + j.astype(jnp.int32), bp)
        uj = jnp.take_along_axis(u, j[:, None], axis=-1)[:, 0]
        vj = jnp.take_along_axis(v, j[:, None], axis=-1)[:, 0]
        buv = jnp.where(closer[:, None], jnp.stack([uj, vj], axis=-1), buv)
        return (bt, bp, buv), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * TRI_CHUNK
    (best_t, best_prim, best_uv), _ = jax.lax.scan(
        body, (best_t, best_prim, best_uv), (v0, e1, e2, bases)
    )
    return _sphere_pass(geom, ray, best_t, best_prim, best_uv)


def sdf_trilerp(data, p):
    """Trilinear SDF sample at local p in [0,1]^3 (grid nodes at the cell
    corners; x -> W, y -> H, z -> D).  p: [..., 3]."""
    D, H, W = data.shape
    x = jnp.clip(p[..., 0], 0.0, 1.0) * (W - 1)
    y = jnp.clip(p[..., 1], 0.0, 1.0) * (H - 1)
    z = jnp.clip(p[..., 2], 0.0, 1.0) * (D - 1)
    x0 = jnp.clip(x.astype(jnp.int32), 0, max(W - 2, 0))
    y0 = jnp.clip(y.astype(jnp.int32), 0, max(H - 2, 0))
    z0 = jnp.clip(z.astype(jnp.int32), 0, max(D - 2, 0))
    fx = x - x0
    fy = y - y0
    fz = z - z0
    flat = data.reshape(-1)

    def at(dz, dy, dx):
        idx = ((z0 + dz) * H + (y0 + dy)) * W + (x0 + dx)
        return flat[jnp.clip(idx, 0, flat.shape[0] - 1)]

    c00 = at(0, 0, 0) * (1 - fx) + at(0, 0, 1) * fx
    c01 = at(0, 1, 0) * (1 - fx) + at(0, 1, 1) * fx
    c10 = at(1, 0, 0) * (1 - fx) + at(1, 0, 1) * fx
    c11 = at(1, 1, 0) * (1 - fx) + at(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def sdf_gradient(data, p, h=None):
    """Central-difference gradient of the trilinear field in local units."""
    D, H, W = data.shape
    if h is None:
        h = 0.5 / max(D, H, W)
    ex = jnp.asarray([h, 0.0, 0.0])
    ey = jnp.asarray([0.0, h, 0.0])
    ez = jnp.asarray([0.0, 0.0, h])
    gx = sdf_trilerp(data, p + ex) - sdf_trilerp(data, p - ex)
    gy = sdf_trilerp(data, p + ey) - sdf_trilerp(data, p - ey)
    gz = sdf_trilerp(data, p + ez) - sdf_trilerp(data, p - ez)
    return jnp.stack([gx, gy, gz], axis=-1) / (2.0 * h)


SDF_STEPS = 96
SDF_TOL = 5e-4


def _sdf_trace(geom: Geometry, ray: Ray, best_t):
    """Sphere tracing of the SDF grid (reference: sdfgrid.cpp ray_intersect
    via its OptiX/embree sphere-trace programs).  Returns (t_world [N],
    hit [N]).  The returned t is differentiable w.r.t. sdf_data AND the ray
    through the implicit function theorem:
        F(t, theta) = f_theta(o + t d) = 0
        =>  t* = stop_grad(t) - F(stop_grad(t)) / stop_grad(dF/dt)."""
    A = geom.sdf_to_local
    o_l = ray.o @ A[:3, :3].T + A[:3, 3]
    d_l = ray.d @ A[:3, :3].T
    s = jnp.linalg.norm(d_l, axis=-1)
    s = jnp.maximum(s, 1e-12)

    # clip the march to the [0,1]^3 grid box (in world-t units)
    inv = 1.0 / jnp.where(jnp.abs(d_l) < 1e-12, 1e-12, d_l)
    t0 = (0.0 - o_l) * inv
    t1 = (1.0 - o_l) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tmax = jnp.minimum(tmax, best_t)
    valid_box = tmax > jnp.maximum(tmin, 0.0)

    t_start = jnp.maximum(tmin, 0.0) + 1e-5

    def cond(st):
        t, armed, done, it = st
        return jnp.any(~done) & (it < SDF_STEPS)

    def body(st):
        # `armed` gates the hit test: rays spawned on (or just inside) the
        # surface band must first exit |f| < tol before a hit can register,
        # or every secondary/shadow ray self-intersects at its origin.
        t, armed, done, it = st
        p = o_l + t[..., None] * d_l
        f = sdf_trilerp(geom.sdf_data, p)
        hit = armed & (f < SDF_TOL)
        armed = armed | (f > 2.0 * SDF_TOL)
        over = t > tmax
        done2 = done | hit | over
        step = jnp.maximum(jnp.abs(f), SDF_TOL * 0.5) / s
        t = jnp.where(done2, t, t + step)
        return t, armed, done2, it + 1

    f0 = sdf_trilerp(geom.sdf_data, o_l + t_start[..., None] * d_l)
    t_end, _, done, _ = jax.lax.while_loop(
        cond, body,
        (t_start, f0 > 2.0 * SDF_TOL, ~valid_box, jnp.int32(0)),
    )
    p_end = o_l + t_end[..., None] * d_l
    f_end = sdf_trilerp(jax.lax.stop_gradient(geom.sdf_data),
                        jax.lax.stop_gradient(p_end))
    hit = valid_box & (f_end < 2.0 * SDF_TOL) & (t_end < tmax) & (t_end > 0.0)

    # implicit-function-theorem differentiable hit distance
    t_sg = jax.lax.stop_gradient(t_end)
    p_att = o_l + t_sg[..., None] * d_l           # attached to ray/transform
    F_att = sdf_trilerp(geom.sdf_data, p_att)     # attached to the grid
    g = sdf_gradient(jax.lax.stop_gradient(geom.sdf_data),
                     jax.lax.stop_gradient(p_att))
    dFdt = jnp.sum(g * jax.lax.stop_gradient(d_l), axis=-1)
    dFdt = jnp.where(jnp.abs(dFdt) < 1e-6, jnp.sign(dFdt) * 1e-6 + 1e-12, dFdt)
    t_diff = t_sg - (F_att - jax.lax.stop_gradient(F_att)) / dFdt
    return jnp.where(hit, t_diff, jnp.inf), hit


def _sphere_pass(geom: Geometry, ray: Ray, best_t, best_prim, best_uv):
    """Analytic-shape closest-hit pass (spheres + SDF grid) + final record
    assembly."""
    if geom.n_spheres > 0:
        # sphere quadratic: ||o + t d - c||^2 = r^2
        oc = ray.o[:, None, :] - geom.sph_center[None]        # [N,S,3]
        b = jnp.sum(oc * ray.d[:, None, :], axis=-1)          # [N,S]
        c = jnp.sum(oc * oc, axis=-1) - geom.sph_radius[None] ** 2
        disc = b * b - c
        # masked sqrt: sqrt(max(disc,0)) has a NaN adjoint at disc<=0
        # (0 * inf) which would poison center/radius gradients
        pos = disc > 0.0
        sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
        t0 = -b - sq
        t1 = -b + sq
        t_s = jnp.where(t0 > 0.0, t0, t1)
        hit = (disc >= 0.0) & (t_s > 0.0)
        t_s = jnp.where(hit, t_s, jnp.inf)
        j = jnp.argmin(t_s, axis=-1)
        tj = jnp.take_along_axis(t_s, j[:, None], axis=-1)[:, 0]
        closer = tj < best_t
        best_t = jnp.where(closer, tj, best_t)
        best_prim = jnp.where(closer, geom.n_tris + j.astype(jnp.int32), best_prim)

    if geom.n_capsules > 0:
        # capsule (swept-sphere segment) quadratic, batched [N, K]
        # (the classic closed form: infinite-cylinder quadratic scaled by
        # |ba|^2, body hit clamped to the segment, spherical end caps)
        a = geom.cap_a
        bvec = geom.cap_b - geom.cap_a
        r = geom.cap_r
        m = ray.o[:, None, :] - a[None]                        # [N,K,3]
        baba = jnp.maximum(jnp.sum(bvec * bvec, axis=-1), 1e-20)   # [K]
        bard = jnp.sum(ray.d[:, None, :] * bvec[None], axis=-1)    # [N,K]
        bam = jnp.sum(m * bvec[None], axis=-1)
        md = jnp.sum(m * ray.d[:, None, :], axis=-1)
        mm = jnp.sum(m * m, axis=-1)
        A = baba[None] - bard * bard
        B = baba[None] * md - bam * bard
        C = baba[None] * mm - bam * bam - (r * r * baba)[None]
        disc = B * B - A * C
        pos = disc > 0.0
        sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
        okA = A > 1e-12
        t_body = jnp.where(
            pos & okA, (-B - sq) / jnp.where(okA, A, 1.0), jnp.inf
        )
        y = bam + t_body * bard
        body_ok = pos & okA & (t_body > 0.0) & (y >= 0.0) & (y <= baba[None])
        t_body = jnp.where(body_ok, t_body, jnp.inf)

        def _cap_sphere(ocd, oc2):
            dsc = ocd * ocd - (oc2 - (r * r)[None])
            p2 = dsc > 0.0
            s2 = jnp.where(p2, jnp.sqrt(jnp.where(p2, dsc, 1.0)), 0.0)
            t0 = -ocd - s2
            t1 = -ocd + s2
            tt = jnp.where(t0 > 0.0, t0, t1)
            return jnp.where(p2 & (tt > 0.0), tt, jnp.inf)

        t_a = _cap_sphere(md, mm)
        t_a = jnp.where(bam + t_a * bard <= 0.0, t_a, jnp.inf)
        t_b2 = _cap_sphere(md - bard, mm - 2.0 * bam + baba[None])
        t_b2 = jnp.where(bam + t_b2 * bard >= baba[None], t_b2, jnp.inf)
        t_cap = jnp.minimum(jnp.minimum(t_body, t_a), t_b2)
        t_cap = jnp.where((geom.cap_shape >= 0)[None], t_cap, jnp.inf)
        jc = jnp.argmin(t_cap, axis=-1)
        tj = jnp.take_along_axis(t_cap, jc[:, None], axis=-1)[:, 0]
        closer = tj < best_t
        best_t = jnp.where(closer, tj, best_t)
        best_prim = jnp.where(
            closer,
            geom.n_tris + geom.n_spheres + jc.astype(jnp.int32), best_prim,
        )

    if geom.n_sdfs > 0:
        t_sdf, hit_sdf = _sdf_trace(geom, ray, best_t)
        closer = hit_sdf & (t_sdf < best_t)
        best_t = jnp.where(closer, t_sdf, best_t)
        best_prim = jnp.where(
            closer,
            jnp.int32(geom.n_tris + geom.n_spheres + geom.n_capsules),
            best_prim,
        )

    found = best_prim >= 0
    t_out = jnp.where(found, best_t, jnp.inf)
    return PreliminaryIntersection(t=t_out, prim_index=best_prim, prim_uv=best_uv)


def ray_test(geom: Geometry, ray: Ray, active=None):
    """Shadow/occlusion query (reference: Scene::ray_test).  On the TPU
    big-mesh path this uses the dedicated any-hit kernel (first hit
    terminates the ray's traversal) instead of a full closest-hit pass."""
    N = ray.o.shape[0]
    if active is None:
        active = jnp.ones((N,), bool)
    if geom.has_bvh and jax.default_backend() != "cpu":
        from ..ops.bvh_sweep import (
            bvh_sweep_occluded, maybe_sort_order, ray_sort_key,
        )

        maxt = jnp.where(active, ray.maxt, -jnp.inf)
        key = ray_sort_key(ray.o, ray.d, geom.bvh_lo[0], geom.bvh_hi[0], maxt)
        order = maybe_sort_order(key)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )
        nbox = jnp.concatenate([geom.bvh_lo, geom.bvh_hi], axis=-1)
        nmeta = jnp.stack([geom.bvh_skip, geom.bvh_payload], axis=-1)
        occ = bvh_sweep_occluded(
            nbox, nmeta, geom.tri_v0, geom.tri_e1, geom.tri_e2,
            ray.o[order], ray.d[order], maxt[order],
        )[inv]
        if geom.n_spheres > 0 or geom.n_capsules > 0 or geom.n_sdfs > 0:
            zero_t = jnp.where(active, ray.maxt, -jnp.inf)
            pi_s = _sphere_pass(
                geom, ray, zero_t, jnp.full((N,), -1, jnp.int32),
                jnp.zeros((N, 2), jnp.float32),
            )
            occ = occ | pi_s.is_valid
        return occ & active
    pi = ray_intersect_preliminary(geom, ray, active)
    return pi.is_valid


def compute_surface_interaction(geom: Geometry, ray: Ray, pi: PreliminaryIntersection):
    """Shading-frame computation after the closest-hit reduction
    (reference: Shape::compute_surface_interaction)."""
    N = ray.o.shape[0]
    valid = pi.is_valid
    prim = jnp.maximum(pi.prim_index, 0)
    is_tri = prim < geom.n_tris
    tprim = jnp.clip(prim, 0, geom.n_tris - 1)

    t = jnp.where(valid, pi.t, jnp.inf)
    p = ray.at(jnp.where(valid, pi.t, 0.0))

    # triangle attributes — packed into ONE [T, 20] table + a single
    # lookup_rows: per-lane gathers from small tables hit a pathological XLA
    # TPU lowering (~11x slower than a one-hot MXU contraction, see
    # core.math.lookup_rows; measured on the cbox bench)
    u = pi.prim_uv[:, 0]
    v = pi.prim_uv[:, 1]
    w = 1.0 - u - v
    T = geom.tri_ng.shape[0]
    # the vertex-normal columns ride the lookup only when any mesh has them
    # (cbox-style scenes save 9 of 20 table columns in the MXU contraction)
    cols = [
        geom.tri_ng,                                   # 0:3
        geom.tri_uv.reshape(T, 6),                     # 3:9
        geom.tri_shape[:, None].astype(jnp.float32),   # 9
    ]
    if geom.has_vertex_normals:
        cols.append(geom.tri_vn.reshape(T, 9))         # 10:19
    row = lookup_rows(jnp.concatenate(cols, axis=-1), tprim)
    ng_t = row[..., 0:3]
    if geom.has_vertex_normals:
        vn = row[..., 10:19].reshape(-1, 3, 3)
        sh_n_t = normalize(
            w[:, None] * vn[:, 0] + u[:, None] * vn[:, 1] + v[:, None] * vn[:, 2]
        )
    else:
        sh_n_t = ng_t
    uv3 = row[..., 3:9].reshape(-1, 3, 2)
    uv_t = w[:, None] * uv3[:, 0] + u[:, None] * uv3[:, 1] + v[:, None] * uv3[:, 2]
    shape_t = row[..., 9].astype(jnp.int32)

    if geom.n_spheres > 0:
        # sphere attributes (statically absent from tri-only scenes: the
        # per-lane arccos/arctan2 sphere-uv transcendentals are not free)
        sprim = jnp.clip(prim - geom.n_tris, 0, max(geom.n_spheres - 1, 0))
        sph_tbl = jnp.concatenate(
            [geom.sph_center, geom.sph_shape[:, None].astype(jnp.float32)], axis=-1
        )
        sph_row = lookup_rows(sph_tbl, sprim)
        center = sph_row[..., 0:3]
        ng_s = normalize(p - center)
        theta = jnp.arccos(jnp.clip(ng_s[:, 2], -1.0, 1.0))
        phi = jnp.arctan2(ng_s[:, 1], ng_s[:, 0])
        uv_s = jnp.stack(
            [phi / (2 * jnp.pi) + 0.5, theta / jnp.pi], axis=-1
        )
        shape_s = sph_row[..., 3].astype(jnp.int32)

        ng = jnp.where(is_tri[:, None], ng_t, ng_s)
        sh_n = jnp.where(is_tri[:, None], sh_n_t, ng_s)
        uv = jnp.where(is_tri[:, None], uv_t, uv_s)
        shape_index = jnp.where(is_tri, shape_t, shape_s)
    else:
        ng, sh_n, uv, shape_index = ng_t, sh_n_t, uv_t, shape_t

    if geom.n_capsules > 0:
        # capsule attributes: radial normal about the clamped axis point,
        # uv = (azimuth about the axis, arc parameter along the segment) —
        # the reference's curve (u = along, v = around) parameterization
        # (src/shapes/linearcurve.cpp)
        base_c = geom.n_tris + geom.n_spheres
        is_cap = (prim >= base_c) & (prim < base_c + geom.n_capsules)
        cprim = jnp.clip(prim - base_c, 0, max(geom.n_capsules - 1, 0))
        cap_tbl = jnp.concatenate(
            [
                geom.cap_a, geom.cap_b,
                geom.cap_shape[:, None].astype(jnp.float32),
            ],
            axis=-1,
        )
        cap_row = lookup_rows(cap_tbl, cprim)
        ca = cap_row[..., 0:3]
        cb = cap_row[..., 3:6]
        ba = cb - ca
        baba = jnp.maximum(jnp.sum(ba * ba, axis=-1), 1e-20)
        yf = jnp.clip(jnp.sum((p - ca) * ba, axis=-1) / baba, 0.0, 1.0)
        axis_pt = ca + yf[:, None] * ba
        dn = p - axis_pt
        ln2 = jnp.sum(dn * dn, axis=-1, keepdims=True)
        good = ln2 > 1e-18
        n_c = jnp.where(
            good, dn * jax.lax.rsqrt(jnp.where(good, ln2, 1.0)), 0.0
        )
        tan_h = ba * jax.lax.rsqrt(baba)[:, None]
        e1c, e2c = coordinate_system(tan_h)
        phi_c = jnp.arctan2(dot(n_c, e2c), dot(n_c, e1c))
        uv_c = jnp.stack([yf, phi_c / (2.0 * jnp.pi) + 0.5], axis=-1)
        shape_c = cap_row[..., 6].astype(jnp.int32)

        ng = jnp.where(is_cap[:, None], n_c, ng)
        sh_n = jnp.where(is_cap[:, None], n_c, sh_n)
        uv = jnp.where(is_cap[:, None], uv_c, uv)
        shape_index = jnp.where(is_cap, shape_c, shape_index)

    if geom.n_sdfs > 0:
        # SDF normal: local gradient mapped by the inverse-transpose
        # (reference: sdfgrid.cpp smooth normal mode)
        is_sdf = prim >= (geom.n_tris + geom.n_spheres + geom.n_capsules)
        A = geom.sdf_to_local
        p_l = p @ A[:3, :3].T + A[:3, 3]
        g_l = sdf_gradient(geom.sdf_data, p_l)
        n_w = g_l @ A[:3, :3]          # (A^T)^T = row-vector times A
        n_w = normalize(n_w)
        ng = jnp.where(is_sdf[:, None], n_w, ng)
        sh_n = jnp.where(is_sdf[:, None], n_w, sh_n)
        uv = jnp.where(is_sdf[:, None], p_l[:, :2], uv)
        shape_index = jnp.where(is_sdf, geom.sdf_shape, shape_index)

    # orient geometric normal to the same hemisphere as shading normal
    ng = jnp.where(dot(ng, sh_n, keepdims=True) < 0.0, -ng, ng)

    sh_s, sh_t = coordinate_system(sh_n)
    wi_world = -ray.d
    wi_local = jnp.stack(
        [dot(wi_world, sh_s), dot(wi_world, sh_t), dot(wi_world, sh_n)], axis=-1
    )

    shape_index = jnp.where(valid, shape_index, -1)
    return SurfaceInteraction(
        t=t, p=p, n=ng, sh_n=sh_n, sh_s=sh_s, sh_t=sh_t, uv=uv,
        wi=wi_local, shape_index=shape_index,
        prim_index=jnp.where(valid, pi.prim_index, -1),
        prim_uv=pi.prim_uv,
    )


# ---------------------------------------------------------------------------
# Host-side shape builders (reference: src/shapes/{rectangle,cube,sphere}.cpp)
# ---------------------------------------------------------------------------

def _bspline_resample(pts, radii, subdiv):
    """Uniform cubic B-spline through the control polygon, sampled at
    `subdiv` points per segment (reference: src/shapes/bsplinecurve.cpp —
    curves are C2 cubic B-splines over the control points)."""
    P = np.asarray(pts, np.float64)
    R = np.asarray(radii, np.float64)
    n = P.shape[0]
    if n < 4:
        return np.asarray(pts, np.float32), np.asarray(radii, np.float32)
    out_p, out_r = [], []
    n_seg = n - 3
    for s in range(n_seg):
        ts = np.linspace(0.0, 1.0, subdiv, endpoint=False) if s < n_seg - 1 \
            else np.linspace(0.0, 1.0, subdiv + 1)
        for t in ts:
            # cubic uniform B-spline basis
            b0 = (1 - t) ** 3 / 6.0
            b1 = (3 * t**3 - 6 * t**2 + 4) / 6.0
            b2 = (-3 * t**3 + 3 * t**2 + 3 * t + 1) / 6.0
            b3 = t**3 / 6.0
            out_p.append(b0 * P[s] + b1 * P[s + 1] + b2 * P[s + 2] + b3 * P[s + 3])
            out_r.append(b0 * R[s] + b1 * R[s + 1] + b2 * R[s + 2] + b3 * R[s + 3])
    return np.asarray(out_p, np.float32), np.asarray(out_r, np.float32)


def make_curve_capsules(curves, kind="linear", to_world=None, subdiv=4):
    """Convert fiber curves into analytic capsule segments (EXACT swept-
    sphere geometry; reference: src/shapes/{linearcurve,bsplinecurve}.cpp).

    `linearcurve` chains map exactly; `bsplinecurve` control polygons are
    resampled to a dense polyline first (subdiv points per spline span), so
    the cross-section is exactly round everywhere and only the spine is a
    polyline approximation — replacing the r2-r4 triangle-tube tessellation
    whose silhouettes were faceted both around AND along the fiber.  Radius
    is the per-segment endpoint mean (exact for untapered fibers).

    curves: list of [P, 4] arrays (x, y, z, radius per vertex).
    Returns a list of {a, b, r} dicts."""
    out = []
    mm = np.asarray(to_world.m, np.float32) if to_world is not None else None
    for c in curves:
        c = np.asarray(c, np.float32)
        pts, radii = c[:, :3], c[:, 3]
        if kind == "bspline":
            pts, radii = _bspline_resample(pts, radii, subdiv)
        if mm is not None:
            pts = pts @ mm[:3, :3].T + mm[:3, 3]
            radii = radii * float(np.cbrt(abs(np.linalg.det(mm[:3, :3]))))
        for i in range(pts.shape[0] - 1):
            out.append({
                "a": pts[i], "b": pts[i + 1],
                "r": 0.5 * (radii[i] + radii[i + 1]),
            })
    return out


def make_curve_tube(curves, kind="linear", to_world=None, subdiv=4, phi_res=8):
    """Tessellate fiber curves into a smooth-shaded triangle tube mesh.

    TPU-native stance: the reference intersects curves analytically with
    per-shape Embree/OptiX programs (src/shapes/{bsplinecurve,linearcurve}
    .cpp); the wavefront tracer keeps ONE flat SoA triangle table, so curves
    are tessellated at load time (phi_res radial segments, parallel-
    transported frames — no twisting) with exact radial shading normals.

    curves: list of [P, 4] arrays (x, y, z, radius per vertex)."""
    verts, norms, uvs, faces = [], [], [], []
    v_off = 0
    for c in curves:
        c = np.asarray(c, np.float32)
        pts, radii = c[:, :3], c[:, 3]
        if kind == "bspline":
            pts, radii = _bspline_resample(pts, radii, subdiv)
        m = pts.shape[0]
        if m < 2:
            continue
        # tangents + parallel-transported frames
        tan = np.zeros_like(pts)
        tan[0] = pts[1] - pts[0]
        tan[-1] = pts[-1] - pts[-2]
        tan[1:-1] = pts[2:] - pts[:-2]
        tan /= np.maximum(np.linalg.norm(tan, axis=-1, keepdims=True), 1e-12)
        u = np.cross(tan[0], [0.0, 0.0, 1.0])
        if np.linalg.norm(u) < 1e-6:
            u = np.cross(tan[0], [0.0, 1.0, 0.0])
        u /= np.linalg.norm(u)
        frames_u = [u]
        for i in range(1, m):
            # rotate previous u into the new tangent plane (parallel transport)
            un = frames_u[-1] - np.dot(frames_u[-1], tan[i]) * tan[i]
            ln = np.linalg.norm(un)
            if ln < 1e-8:
                un = np.cross(tan[i], [0.0, 0.0, 1.0])
                ln = np.linalg.norm(un)
                if ln < 1e-8:
                    un = np.cross(tan[i], [0.0, 1.0, 0.0])
                    ln = np.linalg.norm(un)
            frames_u.append(un / ln)
        phis = 2.0 * np.pi * np.arange(phi_res) / phi_res
        t_par = np.concatenate(
            [[0.0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), axis=-1))]
        )
        t_par /= max(t_par[-1], 1e-12)
        for i in range(m):
            uvec = frames_u[i]
            vvec = np.cross(tan[i], uvec)
            ring_n = (np.cos(phis)[:, None] * uvec[None]
                      + np.sin(phis)[:, None] * vvec[None])
            verts.append(pts[i] + radii[i] * ring_n)
            norms.append(ring_n)
            uvs.append(np.stack(
                [phis / (2 * np.pi), np.full(phi_res, t_par[i])], axis=-1
            ))
        for i in range(m - 1):
            for j in range(phi_res):
                a = v_off + i * phi_res + j
                b = v_off + i * phi_res + (j + 1) % phi_res
                cq = a + phi_res
                dq = b + phi_res
                faces.append([a, b, dq])
                faces.append([a, dq, cq])
        v_off += m * phi_res
    V = np.concatenate(verts).astype(np.float32) if verts else np.zeros((0, 3), np.float32)
    N = np.concatenate(norms).astype(np.float32) if norms else np.zeros((0, 3), np.float32)
    UV = np.concatenate(uvs).astype(np.float32) if uvs else np.zeros((0, 2), np.float32)
    F = np.asarray(faces, np.int32).reshape(-1, 3)
    if to_world is not None:
        M = np.asarray(to_world.m)
        V = (M[:3, :3] @ V.T + M[:3, 3:4]).T.astype(np.float32)
        Ninv = np.linalg.inv(M[:3, :3]).astype(np.float32)
        N = (N @ Ninv).astype(np.float32)
        N /= np.maximum(np.linalg.norm(N, axis=-1, keepdims=True), 1e-12)
    return {"vertices": V, "faces": F, "normals": N, "uvs": UV}


def load_curve_file(filename):
    """Parse the reference's curve text format: one 'x y z radius' per line,
    blank lines separate curves (src/shapes/linearcurve.cpp docs)."""
    curves, cur = [], []
    with open(filename) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                if cur:
                    curves.append(np.asarray(cur, np.float32))
                    cur = []
                continue
            cur.append([float(x) for x in s.split()[:4]])
    if cur:
        curves.append(np.asarray(cur, np.float32))
    return curves


def make_rectangle(to_world):
    """Unit rectangle [-1,1]^2 in the z=0 plane -> 2 triangles
    (reference: src/shapes/rectangle.cpp)."""
    V = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    Vw = np.asarray(to_world.m)[:3, :3] @ V.T
    Vw = (Vw + np.asarray(to_world.m)[:3, 3:4]).T
    return {"vertices": Vw.astype(np.float32), "faces": F, "uvs": UV}


def make_cube(to_world):
    """Unit cube [-1,1]^3 -> 12 triangles (reference: src/shapes/cube.cpp)."""
    faces6 = []
    verts = []
    uvs = []
    idx = 0
    axes = [
        (np.array([0, 0, -1.0]),),
        (np.array([0, 0, 1.0]),),
        (np.array([0, -1.0, 0]),),
        (np.array([0, 1.0, 0]),),
        (np.array([-1.0, 0, 0]),),
        (np.array([1.0, 0, 0]),),
    ]
    for (n,) in axes:
        # build a face with outward normal n
        a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
        u = np.cross(n, a)
        u /= np.linalg.norm(u)
        v = np.cross(n, u)
        corners = [n + (-u - v), n + (u - v), n + (u + v), n + (-u + v)]
        # ensure winding gives outward normal
        c = np.stack(corners)
        wind_n = np.cross(c[1] - c[0], c[2] - c[0])
        if np.dot(wind_n, n) < 0:
            c = c[::-1]
        verts.append(c)
        uvs.append(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
        faces6.append(np.array([[idx, idx + 1, idx + 2], [idx, idx + 2, idx + 3]]))
        idx += 4
    V = np.concatenate(verts).astype(np.float32)
    F = np.concatenate(faces6).astype(np.int32)
    UV = np.concatenate(uvs).astype(np.float32)
    Vw = (np.asarray(to_world.m)[:3, :3] @ V.T + np.asarray(to_world.m)[:3, 3:4]).T
    return {"vertices": Vw.astype(np.float32), "faces": F, "uvs": UV}


def load_obj(path, to_world, flip_tex_coords=True):
    """Minimal Wavefront OBJ loader (reference: src/shapes/obj.cpp)."""
    vs, vns, vts, faces = [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                vs.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vn":
                vns.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vt":
                vts.append([float(x) for x in parts[1:3]])
            elif parts[0] == "f":
                ids = [p.split("/")[0] for p in parts[1:]]
                ids = [int(i) - 1 if int(i) > 0 else len(vs) + int(i) for i in ids]
                for k in range(1, len(ids) - 1):  # fan-triangulate
                    faces.append([ids[0], ids[k], ids[k + 1]])
    V = np.asarray(vs, np.float32)
    F = np.asarray(faces, np.int32)
    Vw = (np.asarray(to_world.m)[:3, :3] @ V.T + np.asarray(to_world.m)[:3, 3:4]).T
    out = {"vertices": Vw.astype(np.float32), "faces": F}
    if vns and len(vns) == len(vs):
        Nw = (np.asarray(to_world.inv)[:3, :3].T @ np.asarray(vns, np.float32).T).T
        Nw /= np.maximum(np.linalg.norm(Nw, axis=-1, keepdims=True), 1e-12)
        out["normals"] = Nw.astype(np.float32)
    if vts and len(vts) == len(vs):
        UV = np.asarray(vts, np.float32)
        if flip_tex_coords:
            UV[:, 1] = 1.0 - UV[:, 1]
        out["uvs"] = UV
    return out
