"""1D distributions with CDF-table sampling.

TPU-native equivalents of the reference's DiscreteDistribution /
ContinuousDistribution / IrregularContinuousDistribution
(reference: include/mitsuba/core/distr_1d.h, 1025 LoC).

Design: each distribution is a small frozen pytree of device arrays (pmf/cdf
tables).  Sampling = vectorized searchsorted over the CDF — a dense,
branch-free gather that XLA maps well; all shapes static.  The tables are
differentiable leaves, which is how e.g. tabphase_polarized exposes its
M11..M34 tables as differentiable scene parameters
(reference: src/phase/tabphase_polarized.cpp:207-212).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _searchsorted(cdf, u):
    """Index of first cdf entry > u.  For small tables a fused compare-all is
    far faster on TPU than the default scan lowering (which emits an
    unfusable dynamic-slice loop); large tables use the log-time scan."""
    method = "compare_all" if cdf.shape[0] <= 512 else "scan"
    return jnp.clip(
        jnp.searchsorted(cdf, u, side="right", method=method), 0, cdf.shape[0] - 1
    )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DiscreteDistribution:
    """Discrete distribution over {0..n-1} (reference: distr_1d.h DiscreteDistribution)."""

    pmf: jnp.ndarray   # [n] unnormalized weights
    cdf: jnp.ndarray   # [n] inclusive prefix sum
    total: jnp.ndarray  # scalar sum

    @staticmethod
    def create(pmf):
        pmf = jnp.asarray(pmf, jnp.float32)
        cdf = jnp.cumsum(pmf)
        return DiscreteDistribution(pmf, cdf, cdf[-1])

    def sample(self, u):
        return _searchsorted(self.cdf, u * self.total)

    def eval_pmf_normalized(self, idx):
        return self.pmf[idx] / self.total

    def sample_pmf(self, u):
        idx = self.sample(u)
        return idx, self.eval_pmf_normalized(idx)

    def sample_reuse(self, u):
        """Sample an index and rescale u to a fresh uniform (reference:
        distr_1d.h sample_reuse) — preserves stratification."""
        scaled = u * self.total
        idx = _searchsorted(self.cdf, scaled)
        lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        w = self.pmf[idx]
        u_new = jnp.clip((scaled - lo) / jnp.maximum(w, 1e-20), 0.0, 1.0)
        return idx, u_new

    def tree_flatten(self):
        return (self.pmf, self.cdf, self.total), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ContinuousDistribution:
    """Piecewise-linear continuous distribution on a regular grid over
    [range[0], range[1]] (reference: distr_1d.h ContinuousDistribution)."""

    pdf: jnp.ndarray       # [n] unnormalized density at nodes
    cdf: jnp.ndarray       # [n-1] integral of each linear segment, prefix-summed
    x0: jnp.ndarray        # range start
    dx: jnp.ndarray        # node spacing
    integral: jnp.ndarray  # total integral

    @staticmethod
    def create(rng, pdf):
        pdf = jnp.asarray(pdf, jnp.float32)
        n = pdf.shape[0]
        x0 = jnp.asarray(rng[0], jnp.float32)
        dx = (jnp.asarray(rng[1], jnp.float32) - x0) / (n - 1)
        seg = 0.5 * (pdf[:-1] + pdf[1:]) * dx
        cdf = jnp.cumsum(seg)
        return ContinuousDistribution(pdf, cdf, x0, dx, cdf[-1])

    def eval_pdf(self, x):
        """Linear interpolation of the (unnormalized) density."""
        t = (x - self.x0) / self.dx
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, self.pdf.shape[0] - 2)
        f = jnp.clip(t - i, 0.0, 1.0)
        val = self.pdf[i] * (1 - f) + self.pdf[i + 1] * f
        inside = (t >= 0) & (t <= self.pdf.shape[0] - 1)
        return jnp.where(inside, val, 0.0)

    def eval_pdf_normalized(self, x):
        return self.eval_pdf(x) / self.integral

    def sample(self, u):
        """Inverse-CDF sample; exact inversion of the piecewise-linear CDF."""
        scaled = u * self.integral
        i = _searchsorted(self.cdf, scaled)
        c_lo = jnp.where(i > 0, self.cdf[jnp.maximum(i - 1, 0)], 0.0)
        rem = scaled - c_lo
        p0 = self.pdf[i]
        p1 = self.pdf[jnp.minimum(i + 1, self.pdf.shape[0] - 1)]
        slope = (p1 - p0) / self.dx
        # solve 0.5*slope*t^2 + p0*t = rem  on segment i
        lin = rem / jnp.maximum(p0, 1e-20)
        disc = jnp.maximum(p0 * p0 + 2.0 * slope * rem, 0.0)
        quad = (jnp.sqrt(disc) - p0) / jnp.where(jnp.abs(slope) < 1e-12, 1.0, slope)
        t = jnp.where(jnp.abs(slope) < 1e-12, lin, quad)
        t = jnp.clip(t, 0.0, self.dx)
        return self.x0 + i * self.dx + t

    def sample_pdf(self, u):
        x = self.sample(u)
        return x, self.eval_pdf_normalized(x)

    def tree_flatten(self):
        return (self.pdf, self.cdf, self.x0, self.dx, self.integral), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class IrregularContinuousDistribution:
    """Piecewise-linear density on an irregular node grid — the table type
    behind tabphase/tabphase_polarized (reference: distr_1d.h
    IrregularContinuousDistribution; src/phase/tabphase_polarized.cpp:100-111)."""

    nodes: jnp.ndarray     # [n] increasing x positions
    pdf: jnp.ndarray       # [n] unnormalized density
    cdf: jnp.ndarray       # [n-1]
    integral: jnp.ndarray

    @staticmethod
    def create(nodes, pdf):
        nodes = jnp.asarray(nodes, jnp.float32)
        pdf = jnp.asarray(pdf, jnp.float32)
        seg = 0.5 * (pdf[:-1] + pdf[1:]) * (nodes[1:] - nodes[:-1])
        cdf = jnp.cumsum(seg)
        return IrregularContinuousDistribution(nodes, pdf, cdf, cdf[-1])

    def eval_pdf(self, x):
        i = jnp.clip(
            jnp.searchsorted(
                self.nodes, x, side="right",
                method="compare_all" if self.nodes.shape[0] <= 512 else "scan",
            ) - 1,
            0, self.nodes.shape[0] - 2,
        )
        x0 = self.nodes[i]
        x1 = self.nodes[i + 1]
        f = jnp.clip((x - x0) / jnp.maximum(x1 - x0, 1e-20), 0.0, 1.0)
        val = self.pdf[i] * (1 - f) + self.pdf[i + 1] * f
        inside = (x >= self.nodes[0]) & (x <= self.nodes[-1])
        return jnp.where(inside, val, 0.0)

    def eval_pdf_normalized(self, x):
        return self.eval_pdf(x) / self.integral

    def sample(self, u):
        scaled = u * self.integral
        i = _searchsorted(self.cdf, scaled)
        c_lo = jnp.where(i > 0, self.cdf[jnp.maximum(i - 1, 0)], 0.0)
        rem = scaled - c_lo
        x0 = self.nodes[i]
        x1 = self.nodes[jnp.minimum(i + 1, self.nodes.shape[0] - 1)]
        w = jnp.maximum(x1 - x0, 1e-20)
        p0 = self.pdf[i]
        p1 = self.pdf[jnp.minimum(i + 1, self.pdf.shape[0] - 1)]
        slope = (p1 - p0) / w
        lin = rem / jnp.maximum(p0, 1e-20)
        disc = jnp.maximum(p0 * p0 + 2.0 * slope * rem, 0.0)
        quad = (jnp.sqrt(disc) - p0) / jnp.where(jnp.abs(slope) < 1e-12, 1.0, slope)
        t = jnp.where(jnp.abs(slope) < 1e-12, lin, quad)
        return x0 + jnp.clip(t, 0.0, w)

    def sample_pdf(self, u):
        x = self.sample(u)
        return x, self.eval_pdf_normalized(x)

    def tree_flatten(self):
        return (self.nodes, self.pdf, self.cdf, self.integral), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)
