"""Volume plugins: 3D fields (reference: src/volumes/{const,grid}.cpp,
include/mitsuba/render/volume.h).

GridVolume stores a dense [D, H, W, C] grid in HBM with trilinear lookup —
dense gathers, no CUDA-texture path needed (XLA handles the gather).  The
world-to-grid mapping comes from the volume's to_world transform (bbox
[0,1]^3 in local coords, like the reference).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ConstVolume:
    """(reference: src/volumes/const.cpp)."""

    value: jnp.ndarray   # [C] or [1]

    def eval(self, p, n_channels):
        v = self.value
        if v.shape[-1] == 1 and n_channels > 1:
            v = jnp.broadcast_to(v, (n_channels,))
        elif v.shape[-1] == 3 and n_channels == 1:
            v = jnp.mean(v, keepdims=True)
        return jnp.broadcast_to(v, p.shape[:-1] + (v.shape[-1] if v.shape[-1] == n_channels else n_channels,))

    def max(self):
        return jnp.max(self.value)

    def parameters_changed(self):
        return self


@struct.dataclass
class GridVolume:
    """Trilinear gridded volume (reference: src/volumes/grid.cpp).
    data: [D, H, W, C] with local coordinates z->D, y->H, x->W over the
    world-space bbox [bbox_min, bbox_max]."""

    data: jnp.ndarray       # [D, H, W, C]
    bbox_min: jnp.ndarray   # [3]
    bbox_max: jnp.ndarray   # [3]

    # corner-packed tables larger than this fall back to the 8-gather path
    # (8x grid memory; 2M cells * 8 corners * 4 B = 64 MB per channel)
    _PACK_LIMIT = 2_000_000

    def _corner_packed(self):
        """[D, H, W, 8, C] with slot k = the (dz, dy, dx) bit-pattern corner
        of cell (z, y, x), edge-clamped.  Built from `data` with pure shifts
        (differentiable; XLA hoists it out of the tracking scan), so ONE
        gather fetches all 8 trilinear corners — a TPU gather of N indices
        costs ~30 ms/M regardless of row width, so the r1-r4 8-gather eval
        made heterogeneous delta tracking gather-bound (measured 50 s for a
        128^2 x 16 spp, depth-16 render; single-gather packing -> ~8x less)."""
        g = self.data
        gx = jnp.concatenate([g, g[:, :, -1:]], axis=2)
        gxy = jnp.concatenate([gx, gx[:, -1:]], axis=1)
        gp = jnp.concatenate([gxy, gxy[-1:]], axis=0)      # [D+1, H+1, W+1, C]
        d, h, w, c = g.shape
        corners = [
            gp[dz:dz + d, dy:dy + h, dx:dx + w]
            for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
        ]
        return jnp.stack(corners, axis=-2)                 # [D, H, W, 8, C]

    def eval(self, p, n_channels):
        d, h, w, c = self.data.shape
        # world -> [0,1]^3 -> voxel coords (cell-centered samples)
        q = (p - self.bbox_min) / (self.bbox_max - self.bbox_min)
        x = q[..., 0] * (w - 1)
        y = q[..., 1] * (h - 1)
        z = q[..., 2] * (d - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
        z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, d - 1)
        fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
        fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
        fz = jnp.clip(z - z0, 0.0, 1.0)[..., None]
        if d * h * w <= self._PACK_LIMIT:
            packed = self._corner_packed().reshape(d * h * w, 8 * c)
            rows = packed[(z0 * h + y0) * w + x0]          # [N, 8C] one gather
            v8 = rows.reshape(rows.shape[:-1] + (8, c))
            wz = jnp.stack([1.0 - fz[..., 0], fz[..., 0]], axis=-1)
            wy = jnp.stack([1.0 - fy[..., 0], fy[..., 0]], axis=-1)
            wx = jnp.stack([1.0 - fx[..., 0], fx[..., 0]], axis=-1)
            w8 = (
                wz[..., :, None, None] * wy[..., None, :, None]
                * wx[..., None, None, :]
            ).reshape(wz.shape[:-1] + (8,))
            v = jnp.sum(v8 * w8[..., None], axis=-2)
        else:
            x1 = jnp.minimum(x0 + 1, w - 1)
            y1 = jnp.minimum(y0 + 1, h - 1)
            z1 = jnp.minimum(z0 + 1, d - 1)
            g = self.data
            v000 = g[z0, y0, x0]
            v001 = g[z0, y0, x1]
            v010 = g[z0, y1, x0]
            v011 = g[z0, y1, x1]
            v100 = g[z1, y0, x0]
            v101 = g[z1, y0, x1]
            v110 = g[z1, y1, x0]
            v111 = g[z1, y1, x1]
            v00 = v000 * (1 - fx) + v001 * fx
            v01 = v010 * (1 - fx) + v011 * fx
            v10 = v100 * (1 - fx) + v101 * fx
            v11 = v110 * (1 - fx) + v111 * fx
            v0 = v00 * (1 - fy) + v01 * fy
            v1 = v10 * (1 - fy) + v11 * fy
            v = v0 * (1 - fz) + v1 * fz
        inside = jnp.all((q >= 0.0) & (q <= 1.0), axis=-1)
        v = jnp.where(inside[..., None], v, 0.0)
        if c == 1 and n_channels > 1:
            v = jnp.broadcast_to(v, v.shape[:-1] + (n_channels,))
        elif c == 3 and n_channels == 1:
            v = jnp.mean(v, axis=-1, keepdims=True)
        return v

    def max(self):
        return jnp.max(self.data)

    def parameters_changed(self):
        return self


def parse_volume(spec, n_channels):
    """Parse a volume spec: float | list | {'type': 'constvolume'|'gridvolume'}."""
    if isinstance(spec, (int, float)):
        return ConstVolume(value=jnp.asarray([float(spec)], jnp.float32)), "value"
    if isinstance(spec, (list, tuple, np.ndarray)):
        return ConstVolume(value=jnp.asarray(spec, jnp.float32)), "value"
    t = spec.get("type")
    if t in ("constvolume", "rgb", "uniform"):
        v = spec.get("value", 1.0)
        if isinstance(v, dict):
            v = v.get("value", 1.0)
        v = np.atleast_1d(np.asarray(v, np.float32))
        return ConstVolume(value=jnp.asarray(v)), "value"
    if t == "gridvolume":
        if "data" in spec:
            data = np.asarray(spec["data"], np.float32)
        else:
            data = load_vol_file(spec["filename"])
        if data.ndim == 3:
            data = data[..., None]
        bbox_min = np.asarray(spec.get("bbox_min", [0.0, 0.0, 0.0]), np.float32)
        bbox_max = np.asarray(spec.get("bbox_max", [1.0, 1.0, 1.0]), np.float32)
        if "to_world" in spec:
            from ..core.transform import build_transform

            m = np.asarray(build_transform(spec["to_world"]).m)
            corners = np.array(
                [[x, y, z] for x in (0.0, 1.0) for y in (0.0, 1.0) for z in (0.0, 1.0)],
                np.float32,
            )
            cw = (m[:3, :3] @ corners.T + m[:3, 3:4]).T
            bbox_min = cw.min(0)
            bbox_max = cw.max(0)
        return (
            GridVolume(
                data=jnp.asarray(data),
                bbox_min=jnp.asarray(bbox_min),
                bbox_max=jnp.asarray(bbox_max),
            ),
            "data",
        )
    from .. import plugin_registry as PR

    if PR.lookup("volume", t) is not None:
        out, _ = PR.construct("volume", t, spec)
        if isinstance(out, dict):
            return parse_volume(out, n_channels)
        leaf = getattr(out, "param_leaf", None)
        if leaf is None:
            fields = getattr(out, "__dataclass_fields__", {})
            leaf = "value" if "value" in fields else next(iter(fields), "value")
        return out, leaf
    raise ValueError(f"unknown volume type {t!r}")


def load_vol_file(fn):
    """Reader for the reference's .vol binary grid format
    (reference: src/render/volumegrid.cpp: 'VOL' magic, version 3, dtype 1 =
    float32, [xres,yres,zres,channels] + bbox, then data z-major)."""
    with open(fn, "rb") as f:
        magic = f.read(3)
        if magic != b"VOL":
            raise ValueError(f"{fn}: not a .vol file")
        version = np.frombuffer(f.read(1), np.uint8)[0]
        dtype = np.frombuffer(f.read(4), np.int32)[0]
        if dtype != 1:
            raise ValueError(f"{fn}: only float32 .vol supported")
        xres, yres, zres, ch = np.frombuffer(f.read(16), np.int32)
        bbox = np.frombuffer(f.read(24), np.float32)
        data = np.frombuffer(f.read(), np.float32).reshape(zres, yres, xres, ch)
        return data.copy()
