"""Non-TIFF raster backend — format breadth parity with GDAL's open-anything
reader (reference: src/io/gdal.rs:57-104 opens any GDAL-supported raster).

Sentinel-1 GRD measurements are always TIFF and take the self-contained codec
path (tiffio.py); this backend covers the *general raster* capability of the
reference's GdalSarReader for PNG / JPEG / BMP / GIF / PPM / WebP inputs,
decoded via PIL with GDAL-compatible sidecar georeferencing:

  * world file (pixel-center convention; same extension family GDAL probes:
    pgw/jgw/bpw/gfw/…, <ext>w, and .wld)
  * .prj sidecar for the CRS ("EPSG:XXXX" or WKT with an AUTHORITY tag)
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..errors import RasterError
from .tiffio import GeoInfo

# extensions PIL handles that we advertise (TIFF stays on the native codec)
PIL_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".gif", ".ppm", ".pgm",
                  ".pbm", ".webp", ".jp2", ".j2k", ".jpx")


def world_file_candidates(path: Path) -> list[Path]:
    """Sidecar names probed for a world file, in priority order: the
    GDAL convention (first+last letter + 'w': bpw/gfw/pmw), the named
    shorthands (jgw/pgw/tfw), <ext>w, the reference writer's first-letter
    + 'w' spelling (worldfile.rs:17-30), and .wld."""
    ext = path.suffix.lstrip(".").lower()
    cands = []
    if ext in ("jpg", "jpeg"):
        cands.append(path.with_suffix(".jgw"))
    elif ext == "png":
        cands.append(path.with_suffix(".pgw"))
    elif ext in ("tif", "tiff"):
        cands.append(path.with_suffix(".tfw"))
    elif len(ext) >= 2:
        cands.append(path.with_suffix("." + ext[0] + ext[-1] + "w"))
    if ext:
        cands.append(path.with_suffix("." + ext + "w"))
        cands.append(path.with_suffix("." + ext[0] + "w"))
    cands.append(path.with_suffix(".wld"))
    return cands


def read_world_file(path: Path):
    """World file → GDAL geotransform (inverse of writers/worldfile.py:
    world files store the CENTER of the upper-left pixel)."""
    for cand in world_file_candidates(path):
        if not cand.is_file():
            continue
        try:
            vals = [float(v) for v in cand.read_text().split()][:6]
        except ValueError:
            continue
        if len(vals) != 6:
            continue
        a, d, b, e, c, f = vals
        return [c - 0.5 * a - 0.5 * b, a, b, f - 0.5 * d - 0.5 * e, d, e]
    return None


def read_prj_epsg(path: Path):
    """EPSG code from a .prj sidecar ('EPSG:XXXX' or WKT AUTHORITY tag)."""
    prj = path.with_suffix(".prj")
    if not prj.is_file():
        return None
    text = prj.read_text().strip()
    if text.upper().startswith("EPSG:"):
        try:
            return int(text[5:])
        except ValueError:
            return None
    from .raster import parse_epsg

    return parse_epsg(text)


class PilRaster:
    """TiffReader-shaped adapter over a PIL-decoded raster.

    Implements the subset RasterReader drives: width/height/samples/dtype,
    read(band), geo_info(), gdal_metadata(), close(). The strip-streaming
    fast paths are TIFF-codec-only and stay disabled for this backend."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover
            raise RasterError("PIL unavailable for non-TIFF rasters") from e
        try:
            im = Image.open(self.path)
            im.load()
        except Exception as e:
            raise RasterError(f"failed to open raster {self.path}: {e}") from e
        # normalize palette images like GDAL's RGB expansion
        if im.mode == "P":
            im = im.convert("RGB")
        if im.mode == "I":
            # genuine 32-bit integer raster: refuse values outside u16 range
            # instead of silently wrapping modulo 2^16 (DN corruption)
            raw = np.asarray(im)
            if raw.size and (raw.min() < 0 or raw.max() > 65535):
                raise RasterError(
                    f"{self.path}: 32-bit integer raster exceeds uint16 "
                    f"range ({raw.min()}..{raw.max()}); convert to uint16 "
                    f"or GeoTIFF first"
                )
            self._data = raw.astype(np.uint16)
            if self._data.ndim == 2:
                self._data = self._data[..., None]
        elif im.mode in ("I;16", "I;16B", "I;16L"):
            self._data = np.asarray(im, np.uint16)[..., None] \
                if np.asarray(im).ndim == 2 else np.asarray(im, np.uint16)
        else:
            self._data = np.asarray(im)
            if self._data.ndim == 2:
                self._data = self._data[..., None]
        self.height, self.width = self._data.shape[:2]
        self.samples = self._data.shape[2]
        self.dtype = self._data.dtype
        self._info = {k: v for k, v in getattr(im, "info", {}).items()
                      if isinstance(v, str)}
        im.close()

    def read(self, band: int = 1) -> np.ndarray:
        if not 1 <= band <= self.samples:
            raise RasterError(
                f"band {band} out of range (raster has {self.samples})")
        return self._data[:, :, band - 1]

    def geo_info(self) -> GeoInfo:
        gt = read_world_file(self.path)
        epsg = read_prj_epsg(self.path)
        return GeoInfo(geotransform=gt, epsg=epsg,
                       is_geographic=epsg == 4326)

    def gdal_metadata(self) -> dict:
        return dict(self._info)

    def close(self):
        self._data = None
