"""JPEG writers at quality 100 (reference: src/io/writers/jpeg.rs:6-30).

The reference hardcodes quality 100 (jpeg.rs:14,27) — deliberately preserved.
4:4:4 subsampling matches a quality-100 encode's intent (no chroma loss).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

JPEG_QUALITY = 100


def write_gray_jpeg(output, cols: int, rows: int, data) -> None:
    """reference: jpeg.rs:6-17."""
    arr = np.asarray(data).reshape(rows, cols).astype(np.uint8, copy=False)
    Image.fromarray(arr, mode="L").save(
        Path(output), format="JPEG", quality=JPEG_QUALITY, subsampling=0
    )


def write_rgb_jpeg(output, cols: int, rows: int, rgb_data) -> None:
    """reference: jpeg.rs:19-30 (interleaved RGB)."""
    arr = np.asarray(rgb_data).reshape(rows, cols, 3).astype(np.uint8, copy=False)
    Image.fromarray(arr, mode="RGB").save(
        Path(output), format="JPEG", quality=JPEG_QUALITY, subsampling=0
    )
