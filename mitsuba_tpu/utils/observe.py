"""Observability: invalid-sample guards, profiler scopes, progress logging
(reference: src/render/imageblock.cpp:122-126 warn_invalid flags,
include/mitsuba/core/profiler.h ProfilerPhase, logger.h).

TPU-native stance: guards are in-graph (masked, branchless) and report via
counters the host reads after the pass — no device->host sync inside jit.
Profiling hooks wrap phases in jax.profiler named scopes so traces captured
with jax.profiler.trace() attribute device time per render phase.
"""
from __future__ import annotations

import contextlib
import logging
import time

import jax
import jax.numpy as jnp

logger = logging.getLogger("mitsuba_tpu")


class LogLevel:
    """(reference: include/mitsuba/core/logger.h LogLevel enum)."""

    Trace = logging.DEBUG - 5
    Debug = logging.DEBUG
    Info = logging.INFO
    Warn = logging.WARNING
    Error = logging.ERROR


def set_log_level(level):
    """mi.set_log_level parity (reference: Logger::set_log_level). Accepts a
    LogLevel value or a logging module level int."""
    logger.setLevel(level)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s  %(message)s"))
        logger.addHandler(h)


def Log(level, msg, *args):
    """mi.Log parity (reference: logger.h Log macro)."""
    logger.log(level, msg, *args)


def warn_invalid(L, active=None, polarized=False, clamp_negative=True):
    """Sanitize per-lane radiance before film accumulation (the reference's
    ImageBlock warn_negative/warn_invalid, imageblock.cpp:122-126): NaN/inf
    splats are dropped, negative values clamped; returns (L_clean, stats)
    where stats = {'n_invalid': [], 'n_negative': []} int32 counters.

    polarized: L is [N, C, 4] Stokes — Q/U/V (trailing components 1:) are
    legitimately negative, so the negativity clamp/counter applies only to
    the intensity component I.

    clamp_negative=False: signed outputs (AOV normals/positions/depth deltas)
    pass through — only non-finite lanes are dropped."""
    bad = ~jnp.isfinite(L)
    neg = (L < 0.0) if clamp_negative else jnp.zeros_like(L, dtype=bool)
    if polarized and clamp_negative:
        stokes_i = jnp.arange(L.shape[-1]) == 0
        neg = neg & stokes_i
    if active is not None:
        act = active
        while act.ndim < L.ndim:
            act = act[..., None]
        bad = bad & act
        neg = neg & act
    n_invalid = jnp.sum(jnp.any(bad, axis=tuple(range(1, L.ndim))).astype(jnp.int32))
    n_negative = jnp.sum(jnp.any(neg & ~bad, axis=tuple(range(1, L.ndim))).astype(jnp.int32))
    L = jnp.where(bad, 0.0, L)
    L = jnp.where(neg, 0.0, L)
    return L, {"n_invalid": n_invalid, "n_negative": n_negative}


def report_invalid(stats, where="render"):
    """Host-side: log once per pass if any lanes were sanitized."""
    ni = int(stats.get("n_invalid", 0))
    nn = int(stats.get("n_negative", 0))
    if ni:
        logger.warning("%s: dropped %d lanes with NaN/inf radiance", where, ni)
    if nn:
        logger.warning("%s: clamped %d lanes with negative radiance", where, nn)
    return ni, nn


@contextlib.contextmanager
def phase(name):
    """Named profiling scope (the ProfilerPhase analog): shows up in traces
    captured with jax.profiler.trace(); also logs wall time at DEBUG level."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(f"mitsuba/{name}"):
        yield
    logger.debug("phase %s: %.1f ms (host wall)", name, (time.perf_counter() - t0) * 1e3)


class Progress:
    """Minimal ProgressReporter analog (reference: logger.h ProgressReporter):
    call update(done, total) from the multi-pass loop."""

    def __init__(self, label="render", stream=None):
        self.label = label
        self.t0 = time.perf_counter()
        self.stream = stream

    def update(self, done, total):
        dt = time.perf_counter() - self.t0
        eta = dt / max(done, 1) * (total - done)
        msg = f"{self.label}: {done}/{total} passes ({dt:.1f}s, eta {eta:.1f}s)"
        if self.stream is not None:
            self.stream.write(msg + "\n")
        else:
            logger.info(msg)
