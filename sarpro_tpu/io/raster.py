"""Generic raster reader — parity with the reference's GdalSarReader
(src/io/gdal.rs:37-187), built on the self-contained TIFF codec.

Provides: dataset metadata (size/bands/geotransform with identity fallback/
projection with GCP fallback/EPSG extraction/flat metadata map), full-window
f32 band reads, and resampled (decimated) reads for downsample-on-read.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

from ..errors import RasterError
from . import geodesy
from .tiffio import GeoInfo, TiffReader


@dataclasses.dataclass
class RasterMetadata:
    """Mirror of the reference's GdalMetadata (gdal.rs:16-35)."""

    size_x: int
    size_y: int
    bands: int
    geotransform: list[float]
    projection: str
    epsg: Optional[int]
    metadata: dict[str, str]


def parse_epsg(wkt: str) -> Optional[int]:
    """EPSG code from a WKT AUTHORITY tag (reference: gdal.rs:43-53)."""
    key = 'AUTHORITY["EPSG","'
    idx = wkt.rfind(key)
    if idx < 0:
        return None
    start = idx + len(key)
    end = wkt.find('"', start)
    if end <= start:
        return None
    try:
        return int(wkt[start:end])
    except ValueError:
        return None


class RasterReader:
    """Opens any (Geo)TIFF raster (reference: GdalSarReader::open, gdal.rs:57-104)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        try:
            self._tiff = TiffReader(self.path)
        except RasterError:
            raise
        except Exception as e:  # pragma: no cover
            raise RasterError(f"failed to open raster {self.path}: {e}") from e
        gi: GeoInfo = self._tiff.geo_info()
        self.geo = gi
        # identity fallback (reference: gdal.rs:64-67)
        gt = gi.geotransform or [0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
        # projection: dataset CRS, falling back to GCP projection (gdal.rs:68-83).
        # A GCP'd raster (multiple tiepoints) is itself UNprojected — its
        # geokeys describe the GCP SRS, so the dataset EPSG must stay None
        # (otherwise the skip-warp guard would wrongly fire).
        projection = ""
        epsg = gi.epsg
        if gi.gcps is not None:
            epsg = None
            gcp_epsg = gi.gcp_epsg or 4326
            projection = geodesy.epsg_to_wkt(gcp_epsg) or f"EPSG:{gcp_epsg}"
        elif epsg is not None:
            projection = geodesy.epsg_to_wkt(epsg) or f"EPSG:{epsg}"
        self.metadata = RasterMetadata(
            size_x=self._tiff.width,
            size_y=self._tiff.height,
            bands=self._tiff.samples,
            geotransform=gt,
            projection=projection,
            epsg=epsg,
            metadata=self._tiff.gdal_metadata(),
        )

    @property
    def gcps(self) -> Optional[np.ndarray]:
        return self.geo.gcps

    def gcp_projection(self) -> str:
        if self.geo.gcps is None:
            return ""
        code = self.geo.gcp_epsg or 4326
        return geodesy.epsg_to_wkt(code) or f"EPSG:{code}"

    def read_band(self, band: int = 1) -> np.ndarray:
        """Full-window f32 read (reference: gdal.rs:107-141)."""
        return self._tiff.read(band).astype(np.float32)

    def read_band_resampled(
        self, band: int, out_cols: int, out_rows: int, alg: str | None = None
    ) -> np.ndarray:
        """Decimated read to (out_rows, out_cols) — the downsample-on-read
        fast path (reference: gdal.rs:145-177). Resampling runs on-device."""
        from ..core.resize import resample_plane

        full = self._tiff.read(band).astype(np.float32)
        filt = alg or "average"
        return np.asarray(resample_plane(full, out_rows, out_cols, filt))

    def close(self):
        self._tiff.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
