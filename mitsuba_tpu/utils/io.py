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


def read_pfm(path):
    """Portable float map reader (reference: src/core/bitmap.cpp read_pfm)."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        color = magic == b"PF"
        if magic not in (b"PF", b"Pf"):
            raise ValueError(f"{path}: not a PFM file")
        w, h = (int(x) for x in f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(
            f.read(), "<f4" if scale < 0 else ">f4", w * h * (3 if color else 1)
        )
    img = data.reshape(h, w, 3) if color else data.reshape(h, w, 1)
    return img[::-1].astype(np.float32) * (abs(scale) if abs(scale) != 1.0 else 1.0)


def write_jpg(path, image, gamma=2.2, quality=95):
    """8-bit JPEG via PIL (reference: bitmap.cpp write_jpeg)."""
    from PIL import Image

    img = np.asarray(image)
    x8 = (np.clip(img, 0.0, 1.0) ** (1.0 / gamma) * 255).astype(np.uint8)
    if x8.ndim == 3 and x8.shape[-1] == 1:
        x8 = x8[..., 0]
    Image.fromarray(x8).convert("RGB").save(path, quality=quality)


def read_ldr(path, gamma=2.2):
    """PNG/JPEG/BMP/TGA reader via PIL, gamma-expanded to linear float32
    (reference: bitmap.cpp read_png/read_jpeg + srgb-to-linear convert)."""
    from PIL import Image

    arr = np.asarray(Image.open(path), np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr**gamma


# ---------------------------------------------------------------------------
# Radiance RGBE (.hdr)  (reference: src/core/bitmap.cpp read_rgbe/write_rgbe)
# ---------------------------------------------------------------------------

def write_rgbe(path, image):
    """Radiance .hdr writer, flat (non-RLE) scanlines — universally read."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    h, w, _ = img.shape
    maxc = img.max(axis=-1)
    e = np.zeros((h, w), np.int32)
    nz = maxc >= 1e-32
    # frexp: maxc = m * 2^e with m in [0.5, 1)
    m, e_ = np.frexp(np.where(nz, maxc, 1.0))
    scale = np.where(nz, m * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e_ + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def read_rgbe(path):
    """Radiance .hdr reader (flat + adaptive-RLE scanlines)."""
    with open(path, "rb") as f:
        if not f.readline().startswith(b"#?"):
            raise ValueError(f"{path}: not a Radiance HDR file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = f.readline().split()
        if dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError(f"{path}: unsupported HDR orientation")
        h, w = int(dims[1]), int(dims[3])
        data = np.frombuffer(f.read(), np.uint8)
    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if (
            pos + 4 <= data.size
            and data[pos] == 2 and data[pos + 1] == 2
            and (int(data[pos + 2]) << 8 | int(data[pos + 3])) == w
        ):
            # adaptive RLE: 4 component planes, each run-length coded
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    n = int(data[pos]); pos += 1
                    if n > 128:  # run
                        rgbe[y, x : x + n - 128, c] = data[pos]
                        pos += 1
                        x += n - 128
                    else:  # literal
                        rgbe[y, x : x + n, c] = data[pos : pos + n]
                        pos += n
                        x += n
        else:
            row = data[pos : pos + 4 * w].reshape(w, 4)
            rgbe[y] = row
            pos += 4 * w
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None] * np.where(
        e > 0, 1.0, 0.0
    )[..., None]


# ---------------------------------------------------------------------------
# Struct conversion (reference: src/core/struct.cpp StructConverter —
# the pixel/component-format + gamma conversion engine behind Bitmap::convert)
# ---------------------------------------------------------------------------

_COMPONENT_RANGES = {
    np.uint8: 255.0, np.uint16: 65535.0, np.uint32: 4294967295.0,
}


def convert(image, component_format=np.float32, srgb_gamma=None, channels=None):
    """Bitmap::convert analog: select channels, convert component format
    (normalizing integer ranges), and apply/remove sRGB gamma.

    `srgb_gamma`: None = keep linear; "to_srgb" applies the sRGB OETF before
    integer quantization; "to_linear" decodes sRGB-encoded input.
    (reference: src/core/bitmap.cpp:602-706 convert + struct.cpp converter)."""
    img = np.asarray(image)
    if img.dtype.type in _COMPONENT_RANGES:
        img = img.astype(np.float32) / _COMPONENT_RANGES[img.dtype.type]
    else:
        img = img.astype(np.float32)
    if channels is not None:
        img = img[..., list(channels)]
    if srgb_gamma == "to_linear":
        img = np.where(
            img <= 0.04045, img / 12.92, ((img + 0.055) / 1.055) ** 2.4
        )
    elif srgb_gamma == "to_srgb":
        img = np.where(
            img <= 0.0031308, img * 12.92, 1.055 * np.maximum(img, 0.0) ** (1 / 2.4) - 0.055
        )
    out_t = np.dtype(component_format).type
    if out_t in _COMPONENT_RANGES:
        return np.clip(
            img * _COMPONENT_RANGES[out_t] + 0.5, 0, _COMPONENT_RANGES[out_t]
        ).astype(out_t)
    return img.astype(out_t)


def write_bitmap(path, image, channel_names=None):
    """Format-dispatching writer (reference: mi.util.write_bitmap, util.py:738)."""
    p = str(path)
    if p.endswith(".exr"):
        write_exr(p, image, channel_names)
    elif p.endswith(".pfm"):
        write_pfm(p, image)
    elif p.endswith(".png"):
        write_png(p, image)
    elif p.endswith(".jpg") or p.endswith(".jpeg"):
        write_jpg(p, image)
    elif p.endswith(".hdr") or p.endswith(".rgbe"):
        write_rgbe(p, image)
    elif p.endswith(".npy"):
        np.save(p, np.asarray(image))
    else:
        raise ValueError(f"unknown image format: {p}")


def read_bitmap(path):
    """Format-dispatching reader returning linear float32 [H, W, C]
    (reference: Bitmap(path) constructor dispatch, bitmap.cpp:129-197)."""
    p = str(path)
    if p.endswith(".exr"):
        img, _ = read_exr(p)
        return img
    if p.endswith(".pfm"):
        return read_pfm(p)
    if p.endswith(".hdr") or p.endswith(".rgbe"):
        return read_rgbe(p)
    if p.endswith(".npy"):
        return np.load(p)
    return read_ldr(p)


class Bitmap:
    """Array-backed bitmap with the reference Bitmap's user surface
    (reference: include/mitsuba/core/bitmap.h): construct from a path or an
    array, `convert()` pixel/component format + gamma, `write()` by
    extension.  Interops with numpy/jnp via __array__."""

    def __init__(self, data, channel_names=None):
        if isinstance(data, (str, bytes)) or hasattr(data, "__fspath__"):
            self.data = np.asarray(read_bitmap(data))
        else:
            self.data = np.asarray(data)
        if self.data.ndim == 2:
            self.data = self.data[..., None]
        self.channel_names = channel_names or (
            ["Y"] if self.data.shape[-1] == 1
            else ["R", "G", "B", "A"][: self.data.shape[-1]]
        )

    # -- reference accessors -------------------------------------------
    @property
    def width(self):
        return self.data.shape[1]

    @property
    def height(self):
        return self.data.shape[0]

    def size(self):
        return (self.width, self.height)

    @property
    def channel_count(self):
        return self.data.shape[-1]

    def __array__(self, dtype=None, copy=None):
        return self.data.astype(dtype) if dtype else self.data

    def convert(self, pixel_format=None, component_format=np.float32,
                srgb_gamma=None, channels=None):
        """Bitmap::convert analog; pixel_format: None|'rgb'|'luminance'."""
        img = self.data
        if pixel_format == "luminance" and img.shape[-1] >= 3:
            img = (
                0.212671 * img[..., 0:1]
                + 0.715160 * img[..., 1:2]
                + 0.072169 * img[..., 2:3]
            )
        elif pixel_format == "rgb" and img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        out = convert(img, component_format, srgb_gamma=srgb_gamma, channels=channels)
        return Bitmap(out)

    def write(self, path):
        write_bitmap(path, self.data, self.channel_names)
        return self

    def __repr__(self):
        return (
            f"Bitmap[{self.width}x{self.height}, "
            f"channels={self.channel_names}, dtype={self.data.dtype}]"
        )
