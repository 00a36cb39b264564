"""JPEG writers at quality 100 (reference: src/io/writers/jpeg.rs:6-30).

The reference hardcodes quality 100 (jpeg.rs:14,27) — deliberately preserved.
4:4:4 subsampling matches the jpeg-encoder crate's behavior at quality >= 90
(no chroma loss). Encoding prefers OpenCV's libjpeg-turbo binding (~15%
faster on the 2048² headline frame, ~3.5x for grayscale) with a PIL
fallback; both produce baseline q100 4:4:4 streams.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

try:
    import cv2

    _CV2_FLAGS = [int(cv2.IMWRITE_JPEG_QUALITY), 100,
                  int(cv2.IMWRITE_JPEG_SAMPLING_FACTOR),
                  int(cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444)]
except ImportError:  # pragma: no cover — cv2 is present in the target env
    cv2 = None

JPEG_QUALITY = 100


def write_gray_jpeg(output, cols: int, rows: int, data) -> None:
    """reference: jpeg.rs:6-17."""
    arr = np.asarray(data).reshape(rows, cols).astype(np.uint8, copy=False)
    if cv2 is not None and Path(output).suffix.lower() in (".jpg", ".jpeg"):
        if cv2.imwrite(str(output), arr, _CV2_FLAGS):
            return
    Image.fromarray(arr, mode="L").save(
        Path(output), format="JPEG", quality=JPEG_QUALITY, subsampling=0
    )


def write_rgb_jpeg(output, cols: int, rows: int, rgb_data,
                   channel_order: str = "rgb") -> None:
    """reference: jpeg.rs:19-30 (interleaved RGB).

    `channel_order="bgr"` accepts BGR-interleaved input (the fused device
    program emits BGR at zero cost for this writer), skipping the host-side
    channel swap entirely on the cv2 path."""
    arr = np.asarray(rgb_data).reshape(rows, cols, 3).astype(np.uint8, copy=False)
    if cv2 is not None and Path(output).suffix.lower() in (".jpg", ".jpeg"):
        # cv2 wants BGR; a strided reverse copy beats cv2.cvtColor's
        # allocate+convert on the single-core host
        bgr = arr if channel_order == "bgr" else np.ascontiguousarray(arr[..., ::-1])
        if cv2.imwrite(str(output), bgr, _CV2_FLAGS):
            return
    rgb = arr if channel_order == "rgb" else arr[..., ::-1]
    Image.fromarray(np.ascontiguousarray(rgb), mode="RGB").save(
        Path(output), format="JPEG", quality=JPEG_QUALITY, subsampling=0
    )
