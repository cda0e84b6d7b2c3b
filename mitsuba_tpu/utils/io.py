"""Image IO (reference: src/core/bitmap.cpp, 2550 LoC: EXR/PNG/JPEG/RGBE/PFM).

Minimal self-contained writers/readers: OpenEXR (uncompressed scanline,
float32/half), PFM, and PNG via PIL when available.  write_bitmap mirrors
mi.util.write_bitmap (reference: util.py:738)."""
from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# OpenEXR (uncompressed scanline, FLOAT)
# ---------------------------------------------------------------------------

def write_exr(path, image, channel_names=None):
    """Write [H, W, C] float32 as an uncompressed scanline EXR.

    Default channel names: C=1 -> Y; C=3 -> RGB; C=4 -> RGBA; else ch00..;
    Stokes layouts can pass e.g. ['I','Q','U','V']."""
    img = np.ascontiguousarray(np.asarray(image, np.float32))
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if channel_names is None:
        channel_names = {1: ["Y"], 3: ["R", "G", "B"], 4: ["R", "G", "B", "A"]}.get(
            c, [f"ch{i:02d}" for i in range(c)]
        )
    assert len(channel_names) == c
    # EXR stores channels alphabetically
    order = sorted(range(c), key=lambda i: channel_names[i])

    def attr(name, typ, data):
        return (
            name.encode() + b"\x00" + typ.encode() + b"\x00"
            + struct.pack("<i", len(data)) + data
        )

    chlist = b""
    for i in order:
        chlist += (
            channel_names[i].encode() + b"\x00"
            + struct.pack("<i", 2)          # FLOAT
            + struct.pack("<i", 0)          # pLinear + reserved
            + struct.pack("<ii", 1, 1)      # x/y sampling
        )
    chlist += b"\x00"

    header = b""
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", b"\x00")          # NONE
    header += attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")              # increasing Y
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    with open(path, "wb") as f:
        f.write(struct.pack("<I", 20000630))    # magic
        f.write(struct.pack("<I", 2))           # version 2, no flags
        f.write(header)
        # scanline offset table
        offset0 = 8 + len(header) + 8 * h
        line_size = 8 + w * 4 * c
        for y in range(h):
            f.write(struct.pack("<Q", offset0 + y * line_size))
        for y in range(h):
            f.write(struct.pack("<ii", y, w * 4 * c))
            for i in order:
                f.write(img[y, :, i].tobytes())


def read_exr(path):
    """Read an uncompressed-FLOAT scanline EXR written by write_exr (plus any
    other NONE-compressed float EXR with identical x/y sampling)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<II", data, 0)
    assert magic == 20000630, "not an EXR file"
    pos = 8
    channels = []
    dw = None
    compression = 0
    while data[pos] != 0:
        end = data.index(b"\x00", pos)
        name = data[pos:end].decode()
        pos = end + 1
        end = data.index(b"\x00", pos)
        typ = data[pos:end].decode()
        pos = end + 1
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        payload = data[pos : pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while payload[cpos] != 0:
                cend = payload.index(b"\x00", cpos)
                cname = payload[cpos:cend].decode()
                cpos = cend + 1
                (ptype,) = struct.unpack_from("<i", payload, cpos)
                cpos += 16
                channels.append((cname, ptype))
        elif name == "dataWindow":
            dw = struct.unpack("<4i", payload)
        elif name == "compression":
            compression = payload[0]
    pos += 1   # header terminator
    assert compression == 0, "only uncompressed EXR supported"
    x0, y0, x1, y1 = dw
    w, h = x1 - x0 + 1, y1 - y0 + 1
    c = len(channels)
    pos += 8 * h   # offset table
    out = np.zeros((h, w, c), np.float32)
    for y in range(h):
        _, nbytes = struct.unpack_from("<ii", data, pos)
        pos += 8
        for i, (cname, ptype) in enumerate(channels):
            if ptype == 2:   # FLOAT
                out[y, :, i] = np.frombuffer(data, "<f4", w, pos)
                pos += 4 * w
            elif ptype == 1:  # HALF
                out[y, :, i] = np.frombuffer(data, "<f2", w, pos).astype(np.float32)
                pos += 2 * w
            else:
                raise ValueError("UINT channels unsupported")
    names = [cn for cn, _ in channels]
    # reorder RGB if alphabetized as B,G,R
    if names == ["B", "G", "R"]:
        out = out[..., ::-1].copy()
        names = ["R", "G", "B"]
    return out, names


# ---------------------------------------------------------------------------
# PFM + PNG
# ---------------------------------------------------------------------------

def write_pfm(path, image):
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    color = c == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        f.write(img[::-1].tobytes())


def write_png(path, image, gamma=2.2):
    """Tonemapped 8-bit PNG via PIL (gamma only; see utils/tonemap.py)."""
    from PIL import Image

    img = np.asarray(image)
    x8 = (np.clip(img, 0.0, 1.0) ** (1.0 / gamma) * 255).astype(np.uint8)
    if x8.ndim == 3 and x8.shape[-1] == 1:
        x8 = x8[..., 0]
    Image.fromarray(x8).save(path)


def write_bitmap(path, image, channel_names=None):
    """Format-dispatching writer (reference: mi.util.write_bitmap, util.py:738)."""
    p = str(path)
    if p.endswith(".exr"):
        write_exr(p, image, channel_names)
    elif p.endswith(".pfm"):
        write_pfm(p, image)
    elif p.endswith(".png") or p.endswith(".jpg"):
        write_png(p, image)
    elif p.endswith(".npy"):
        np.save(p, np.asarray(image))
    else:
        raise ValueError(f"unknown image format: {p}")
