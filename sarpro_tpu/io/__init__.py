"""Host-side I/O: SAFE discovery/metadata, raster codecs, writers, geodesy.

This layer replaces the reference's GDAL binding + gdalwarp/gdalinfo
subprocesses (src/io/) with self-contained codecs and on-device reprojection:
the TIFF/GeoTIFF codec lives in `tiffio` (native-accelerated when built),
Sentinel-1 SAFE reading in `safe`, output writers under `writers/`, and the
UTM/UPS/TPS math that powers the warp kernel in `geodesy`.
"""
from .safe import SafeMetadata, SafeReader, TargetCrsArg  # noqa: F401
