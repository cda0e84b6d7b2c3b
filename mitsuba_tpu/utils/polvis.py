"""Stokes-component visualization (reference: src/python/python/polvis.py,
223 LoC): false-color Q/U/V maps, degree and angle of linear polarization.

Library API + CLI:  python -m mitsuba_tpu.utils.polvis stokes.exr out_prefix
"""
from __future__ import annotations

import numpy as np


def dolp(stokes):
    """Degree of linear polarization sqrt(Q^2+U^2)/I; stokes [..., 4]."""
    I, Q, U = stokes[..., 0], stokes[..., 1], stokes[..., 2]
    return np.sqrt(Q**2 + U**2) / np.maximum(I, 1e-9)


def dop(stokes):
    """Total degree of polarization sqrt(Q^2+U^2+V^2)/I."""
    I = stokes[..., 0]
    return np.sqrt((stokes[..., 1:] ** 2).sum(-1)) / np.maximum(I, 1e-9)


def aolp(stokes):
    """Angle of linear polarization 0.5 atan2(U, Q) in [-pi/2, pi/2]."""
    return 0.5 * np.arctan2(stokes[..., 2], stokes[..., 1])


def falsecolor_signed(x, scale=None):
    """Signed data -> red (negative) / blue (positive) false color [H,W,3]
    (polvis convention)."""
    x = np.asarray(x)
    if scale is None:
        scale = max(float(np.abs(x).max()), 1e-9)
    t = np.clip(x / scale, -1.0, 1.0)
    r = np.clip(-t, 0, 1)
    b = np.clip(t, 0, 1)
    g = np.zeros_like(t)
    return np.stack([r, g, b], axis=-1)


def falsecolor_aolp(angle, dolp_weight=None):
    """Angle of polarization as hue (HSV wheel over [-pi/2, pi/2]), optionally
    weighted by DoLP as value."""
    h = (angle / np.pi + 0.5) % 1.0
    s = np.ones_like(h)
    v = np.ones_like(h) if dolp_weight is None else np.clip(dolp_weight, 0, 1)
    i = (h * 6).astype(int) % 6
    f = h * 6 - np.floor(h * 6)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r, g, b], axis=-1)


def visualize(stokes_image, out_prefix, channel=0):
    """Write I / Q / U / V / DoLP / AoLP visualizations for a [H, W, 4, C]
    (or [H, W, 4]) Stokes image (the layout of polarized mi.render)."""
    from .io import write_png

    s = np.asarray(stokes_image)
    if s.ndim == 4:
        s = s[:, :, :, channel]
    s = np.moveaxis(s, 2, -1) if s.shape[-1] != 4 else s  # -> [H, W, 4]
    I = s[..., 0]
    scale_i = max(float(np.percentile(I, 99)), 1e-9)
    write_png(f"{out_prefix}_I.png", I / scale_i)
    for k, name in [(1, "Q"), (2, "U"), (3, "V")]:
        write_png(f"{out_prefix}_{name}.png", falsecolor_signed(s[..., k], scale_i), gamma=1.0)
    write_png(f"{out_prefix}_dolp.png", np.repeat(dolp(s)[..., None], 3, -1), gamma=1.0)
    write_png(f"{out_prefix}_aolp.png", falsecolor_aolp(aolp(s), dolp(s)), gamma=1.0)


def main(argv=None):
    import argparse

    from .io import read_exr

    ap = argparse.ArgumentParser(description="Stokes EXR visualizer (polvis)")
    ap.add_argument("input", help="EXR with I/Q/U/V channels")
    ap.add_argument("out_prefix")
    args = ap.parse_args(argv)
    img, names = read_exr(args.input)
    idx = {n: i for i, n in enumerate(names)}
    s = np.stack([img[..., idx[n]] for n in ("I", "Q", "U", "V")], axis=-1)
    visualize(s, args.out_prefix)


if __name__ == "__main__":
    main()
