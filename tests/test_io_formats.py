"""Bitmap IO formats: RGBE (.hdr), PFM read, JPEG, struct conversion
(reference: src/core/bitmap.cpp read_rgbe/write_rgbe/read_pfm/write_jpeg,
src/core/struct.cpp StructConverter)."""
import numpy as np
import pytest

from mitsuba_tpu.utils.io import (
    convert, read_bitmap, read_ldr, read_pfm, read_rgbe,
    write_bitmap, write_jpg, write_pfm, write_rgbe,
)


def _hdr_image(h=9, w=13, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.gamma(1.5, 1.0, (h, w, 3)).astype(np.float32)
    img[2, 3] = [120.0, 0.5, 1e-4]   # wide dynamic range
    img[5, 5] = 0.0                  # zero pixel (e == 0 encoding)
    return img


def test_rgbe_roundtrip(tmp_path):
    img = _hdr_image()
    p = str(tmp_path / "x.hdr")
    write_rgbe(p, img)
    back = read_rgbe(p)
    assert back.shape == img.shape
    # shared-exponent format: error bound is one mantissa ulp of the
    # brightest channel in each pixel, not a per-channel relative error
    ulp = img.max(axis=-1, keepdims=True) / 128.0
    assert (np.abs(back - img) <= ulp + 1e-6).all()
    np.testing.assert_array_equal(back[5, 5], 0.0)


def test_rgbe_rle_read(tmp_path):
    """Adaptive-RLE scanlines (the format most .hdr files in the wild use)."""
    h, w = 4, 32
    img = np.ones((h, w, 3), np.float32) * 0.75  # constant rows: long runs
    p = str(tmp_path / "rle.hdr")
    # hand-encode RLE: header + per-scanline [2,2,hi,lo] + 4 run-coded planes
    maxc = img.max(axis=-1)
    m, e = np.frexp(maxc)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * (m * 256.0 / maxc)[..., None], 0, 255)
    rgbe[..., 3] = e + 128
    with open(p, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        for y in range(h):
            f.write(bytes([2, 2, w >> 8, w & 0xFF]))
            for c in range(4):
                f.write(bytes([128 + w, int(rgbe[y, 0, c])]))  # one run
    back = read_rgbe(p)
    np.testing.assert_allclose(back, img, rtol=0.01)


def test_pfm_roundtrip(tmp_path):
    img = _hdr_image(seed=1)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    back = read_pfm(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_jpeg_write_read(tmp_path):
    img = np.zeros((16, 16, 3), np.float32)
    img[:, :8] = [0.9, 0.1, 0.1]
    img[:, 8:] = [0.1, 0.1, 0.9]
    p = str(tmp_path / "x.jpg")
    write_jpg(p, img, quality=95)
    back = read_ldr(p)
    assert back.shape == (16, 16, 3)
    # lossy: compare block means
    np.testing.assert_allclose(
        back[:, :6].mean(axis=(0, 1)), img[0, 0], atol=0.1
    )


def test_dispatch_readers(tmp_path):
    img = _hdr_image(seed=2)
    for ext, tol in (("hdr", None), ("pfm", 1e-6), ("npy", 0.0)):
        p = str(tmp_path / f"d.{ext}")
        write_bitmap(p, img)
        back = read_bitmap(p)
        if tol is None:  # RGBE: shared-exponent ulp bound
            ulp = img.max(axis=-1, keepdims=True) / 128.0
            assert (np.abs(back - img) <= ulp + 1e-6).all()
        else:
            np.testing.assert_allclose(back, img, rtol=max(tol, 1e-12), atol=1e-6)
    p = str(tmp_path / "d.jpg")
    write_bitmap(p, img)
    assert read_bitmap(p).shape == img.shape
    with pytest.raises(ValueError):
        write_bitmap(str(tmp_path / "d.xyz"), img)


def test_convert_component_formats():
    img = np.asarray([[[0.0, 0.5, 1.0]]], np.float32)
    u8 = convert(img, np.uint8)
    assert u8.dtype == np.uint8 and list(u8[0, 0]) == [0, 128, 255]
    back = convert(u8, np.float32)
    np.testing.assert_allclose(back, img, atol=1 / 255)
    u16 = convert(img, np.uint16)
    assert u16.dtype == np.uint16 and u16[0, 0, 2] == 65535


def test_convert_srgb_gamma_roundtrip():
    img = np.linspace(0, 1, 32, dtype=np.float32).reshape(1, 32, 1)
    enc = convert(img, np.float32, srgb_gamma="to_srgb")
    dec = convert(enc, np.float32, srgb_gamma="to_linear")
    np.testing.assert_allclose(dec, img, atol=1e-5)
    # official IEC 61966-2-1 anchor: linear 0.18 -> sRGB ~0.4613
    mid = convert(np.asarray([[[0.18]]], np.float32), np.float32, srgb_gamma="to_srgb")
    assert abs(float(mid) - 0.4613) < 2e-3


def test_convert_channel_select():
    img = np.arange(12, dtype=np.float32).reshape(1, 1, 12)
    out = convert(img, np.float32, channels=[3, 0])
    assert out.shape == (1, 1, 2) and out[0, 0, 0] == 3.0 and out[0, 0, 1] == 0.0


def test_bitmap_class():
    """Bitmap wrapper: construct/convert/write/size parity
    (reference: bitmap.h user surface)."""
    from mitsuba_tpu.utils.io import Bitmap

    img = np.random.default_rng(0).random((6, 8, 3)).astype(np.float32)
    b = Bitmap(img)
    assert b.size() == (8, 6) and b.channel_count == 3
    lum = b.convert(pixel_format="luminance")
    assert lum.channel_count == 1
    u8 = b.convert(component_format=np.uint8, srgb_gamma="to_srgb")
    assert np.asarray(u8).dtype == np.uint8
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "b.exr")
        b.write(p)
        b2 = Bitmap(p)
        np.testing.assert_allclose(np.asarray(b2), img, atol=1e-3)


def test_log_level_api():
    import mitsuba_tpu as mi

    mi.set_log_level(mi.LogLevel.Warn)
    mi.Log(mi.LogLevel.Info, "hidden %d", 1)
    mi.Log(mi.LogLevel.Warn, "shown %d", 2)
