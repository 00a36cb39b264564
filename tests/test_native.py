"""Tests for the native TIFF codec (ctypes) and its Python fallbacks."""
import numpy as np
import pytest
from PIL import Image

from sarpro_tpu import _native
from sarpro_tpu.io import tiffio
from sarpro_tpu.io.tiffio import TiffReader

needs_native = pytest.mark.skipif(
    not _native.available(), reason="native codec not built"
)


@needs_native
def test_native_lzw_matches_python(rng):
    arr = rng.integers(0, 255, (200, 300)).astype(np.uint8)
    Image.fromarray(arr).save("/tmp/_t_lzw.tif", compression="tiff_lzw")
    r = TiffReader("/tmp/_t_lzw.tif")
    blob = None
    r._fh.seek(int(r.offsets[0]))
    blob = r._fh.read(int(r.byte_counts[0]))
    cap = int(r.rows_per_strip) * r.width
    native = _native.lzw_decode(blob, cap)
    python = tiffio._lzw_decode(blob)[:cap]
    assert native == python


@needs_native
def test_native_packbits_matches_python(rng):
    # runs + literals
    data = np.repeat(rng.integers(0, 255, 50).astype(np.uint8), rng.integers(1, 9, 50))
    import io

    im = Image.fromarray(data.reshape(1, -1))
    im.save("/tmp/_t_pb.tif", compression="packbits")
    r = TiffReader("/tmp/_t_pb.tif")
    r._fh.seek(int(r.offsets[0]))
    blob = r._fh.read(int(r.byte_counts[0]))
    native = _native.packbits_decode(blob, data.size)
    python = tiffio._packbits_decode(blob)[:data.size]
    assert native == python


@needs_native
def test_native_parallel_strip_read(rng):
    """Many-strip LZW file decodes identically through the parallel path."""
    arr = rng.integers(0, 255, (512, 640)).astype(np.uint8)
    Image.fromarray(arr).save("/tmp/_t_strips.tif", compression="tiff_lzw",
                              tiffinfo={278: 32})  # RowsPerStrip=32
    r = TiffReader("/tmp/_t_strips.tif")
    assert len(r.offsets) > 4
    np.testing.assert_array_equal(r.read(1), arr)


def test_python_fallback_used_when_unavailable(rng, monkeypatch):
    arr = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    Image.fromarray(arr).save("/tmp/_t_fb.tif", compression="tiff_lzw")
    monkeypatch.setattr(_native, "_LIB", None)
    monkeypatch.setattr(_native, "_TRIED", True)
    assert not _native.available()
    np.testing.assert_array_equal(TiffReader("/tmp/_t_fb.tif").read(1), arr)


def test_predictor2_undo(rng):
    """Horizontal differencing predictor (deflate path, Python)."""
    rows, cols = 40, 96
    orig = rng.integers(0, 255, (rows, cols)).astype(np.uint8)
    # build a deflate TIFF with predictor=2 by hand via the writer + patching
    import struct
    import zlib

    diff = orig.astype(np.int16).copy()
    diff[:, 1:] = (orig[:, 1:].astype(np.int16) - orig[:, :-1].astype(np.int16))
    payload = zlib.compress(diff.astype(np.uint8).tobytes())
    # minimal single-strip TIFF
    tags = []

    def tag(tid, ftype, count, value):
        tags.append(struct.pack("<HHI4s", tid, ftype, count, value))

    data_offset = 8 + 2 + 12 * 9 + 4
    tag(256, 3, 1, struct.pack("<HH", cols, 0))
    tag(257, 3, 1, struct.pack("<HH", rows, 0))
    tag(258, 3, 1, struct.pack("<HH", 8, 0))
    tag(259, 3, 1, struct.pack("<HH", 8, 0))        # deflate
    tag(262, 3, 1, struct.pack("<HH", 1, 0))
    tag(273, 4, 1, struct.pack("<I", data_offset))
    tag(279, 4, 1, struct.pack("<I", len(payload)))
    tag(278, 3, 1, struct.pack("<HH", rows, 0))
    tag(317, 3, 1, struct.pack("<HH", 2, 0))        # predictor=2
    buf = b"II" + struct.pack("<HI", 42, 8)
    buf += struct.pack("<H", len(tags)) + b"".join(tags) + struct.pack("<I", 0)
    buf += payload
    path = "/tmp/_t_pred.tif"
    with open(path, "wb") as fh:
        fh.write(buf)
    got = TiffReader(path).read(1)
    np.testing.assert_array_equal(got, orig)
