"""O_DIRECT chunked batch-loader reads (io/raster.py:_read_average_direct).

Batch loaders route contiguous-raster average reads through O_DIRECT DMA
(page-cache bypass, ~9% vCPU vs ~94% for the buffered fault path on the
bench host) — the output must be BIT-IDENTICAL to the buffered mmap path
(same windows, same native reducer), and the pipelined directory driver
with direct_io must produce byte-identical files to the serial driver.
Where the filesystem rejects O_DIRECT the path falls back to mmap, so
these tests hold everywhere.
"""
import numpy as np
import pytest

import fixtures
from sarpro_tpu import _native
from sarpro_tpu.io import raster as raster_mod
from sarpro_tpu.io.raster import RasterReader

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native codec not built")


@pytest.fixture(scope="module")
def safe(tmp_path_factory):
    root = tmp_path_factory.mktemp("directio")
    return fixtures.make_safe(root, shape=(531, 640), seed=11)


def _band(safe):
    return sorted((safe / "measurement").glob("*.tiff"))[0]


@pytest.mark.parametrize("out", [(64, 64), (128, 96), (101, 77)])
def test_direct_read_bit_identical(safe, out):
    p = _band(safe)
    want = RasterReader(p).read_band_resampled(1, out[1], out[0], "average")
    tok = raster_mod.DIRECT_IO.set(True)
    try:
        got = RasterReader(p).read_band_resampled(1, out[1], out[0],
                                                  "average")
    finally:
        raster_mod.DIRECT_IO.reset(tok)
    np.testing.assert_array_equal(got, want)


def test_direct_read_edge_shapes(safe):
    p = _band(safe)
    r = RasterReader(p)
    try:
        got = r._read_average_direct(
            np.empty((80, 96), np.float32),
            raster_mod._average_windows(r.metadata.size_y, 80),
            raster_mod._average_windows(r.metadata.size_x, 96))
    except OSError:
        pytest.skip("O_DIRECT unsupported on this filesystem")
    want = RasterReader(p).read_band_resampled(1, 96, 80, "average")
    np.testing.assert_array_equal(got, want)
    # degenerate: single output row whose window spans many source rows
    want1 = RasterReader(p).read_band_resampled(1, 33, 1, "average")
    got1 = r._read_average_direct(
        np.empty((1, 33), np.float32),
        raster_mod._average_windows(r.metadata.size_y, 1),
        raster_mod._average_windows(r.metadata.size_x, 33))
    np.testing.assert_array_equal(got1, want1)


def test_pipelined_direct_matches_serial(tmp_path):
    """Directory batch: pipelined driver (direct_io on, the default) writes
    byte-identical outputs to the serial driver."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend test")
    from sarpro_tpu import api
    from sarpro_tpu.params import ProcessingParams
    from sarpro_tpu.parallel.batch import process_directory_pipelined
    from sarpro_tpu.types import (AutoscaleStrategy, OutputFormat,
                                  Polarization)

    indir = tmp_path / "in"
    indir.mkdir()
    for i in range(2):
        fixtures.make_safe(indir, name=f"S1A_IW_GRDH_1SDV_2025070{i}T0.SAFE",
                           shape=(301, 320), seed=20 + i)
    params = ProcessingParams(
        format=OutputFormat.JPEG, polarization=Polarization.MULTIBAND,
        autoscale=AutoscaleStrategy.CLAHE, size=64, resample_alg=None)
    out_s = tmp_path / "serial"
    out_p = tmp_path / "pipe"
    rep_s = api.process_directory_to_path(indir, out_s, params, fast=True)
    rep_p = process_directory_pipelined(indir, out_p, params, prefetch=2,
                                        fast=True, device_batch=1)
    assert (rep_s.processed, rep_s.errors) == (2, 0)
    assert (rep_p.processed, rep_p.errors) == (2, 0)
    for f in sorted(out_s.glob("*.jpg")):
        assert (out_p / f.name).read_bytes() == f.read_bytes(), f.name
