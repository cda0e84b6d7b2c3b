"""Laplacian-preconditioned mesh optimization ("Large Steps in Inverse
Rendering of Geometry", Nicolet et al. 2021; reference:
src/python/python/ad/largesteps.py:55-161).

The reference factorizes (I + lambda L) with Cholesky (cholespy); here the
solve is matrix-free conjugate gradients (jax.scipy.sparse.linalg.cg) over a
segment-sum Laplacian matvec — no sparse factorization library, and the
matvec maps well to TPU gathers/scatters."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class LargeSteps:
    """ls = LargeSteps(verts, faces, lambda_); u = ls.to_differential(v);
    v = ls.from_differential(u).  Optimize u with uniform Adam
    (reference: largesteps.py docs recommend Adam(uniform=True))."""

    def __init__(self, verts, faces, lambda_=19.0):
        faces = np.asarray(faces, np.int64)
        n = int(np.asarray(verts).shape[0])
        # undirected edge list from triangles
        e = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
        )
        e = np.sort(e, axis=1)
        e = np.unique(e, axis=0)
        self.n = n
        self.lambda_ = float(lambda_)
        self.edges_a = jnp.asarray(e[:, 0], jnp.int32)
        self.edges_b = jnp.asarray(e[:, 1], jnp.int32)
        deg = np.zeros(n, np.float32)
        np.add.at(deg, e[:, 0], 1.0)
        np.add.at(deg, e[:, 1], 1.0)
        self.degree = jnp.asarray(deg)

    def _matvec(self, v):
        """(I + lambda L) v with the combinatorial Laplacian L = D - A."""
        va = v[self.edges_a]
        vb = v[self.edges_b]
        neigh = jnp.zeros_like(v)
        neigh = neigh.at[self.edges_a].add(vb)
        neigh = neigh.at[self.edges_b].add(va)
        Lv = self.degree[:, None] * v - neigh
        return v + self.lambda_ * Lv

    def to_differential(self, v):
        """v -> u = (I + lambda L) v (reference: to_differential)."""
        return self._matvec(jnp.asarray(v, jnp.float32))

    def from_differential(self, u, tol=1e-6, maxiter=500):
        """u -> v solving (I + lambda L) v = u by CG
        (SPD system; replaces the reference's Cholesky solve)."""
        u = jnp.asarray(u, jnp.float32)
        v, _ = jax.scipy.sparse.linalg.cg(
            self._matvec, u, tol=tol, maxiter=maxiter,
            M=lambda x: x / (1.0 + self.lambda_ * self.degree)[:, None],
        )
        return v
