"""cs2cs-piped generic CRS backend (gdalwarp arbitrary `-t_srs` parity).

A CRS whose projection method has no native implementation (omerc, moll,
cea, cass, eqc, south-west-axis Krovak, non-Greenwich prime meridians, ...)
is evaluated by piping the warp's coarse mapping grids through `cs2cs` —
the same subprocess pattern the reference uses for EVERY warp
(src/io/sentinel1.rs:988-1041 shells out to gdalwarp, which accepts any
PROJ-known target). Axis order/direction is normalized to GIS east,north,
matching gdalwarp's traditional-order geotransforms.
"""
import shutil
import subprocess

import numpy as np
import pytest

from sarpro_tpu.io import geodesy

HAS_PROJ = (shutil.which("cs2cs") is not None
            and shutil.which("projinfo") is not None)
pytestmark = pytest.mark.skipif(not HAS_PROJ, reason="PROJ tools missing")


def _cs2cs_raw(pts_latlon, code):
    """Direct cs2cs call in the target's authority axis order."""
    inp = "\n".join(f"{lat:.10f} {lon:.10f}" for lat, lon in pts_latlon)
    r = subprocess.run(
        ["cs2cs", "EPSG:4326", f"EPSG:{code}", "-f", "%.6f"],
        input=inp + "\n", capture_output=True, text=True, check=True,
    )
    return np.array([[float(v) for v in line.split()[:2]]
                     for line in r.stdout.strip().splitlines()])


@pytest.mark.parametrize("code,frag", [
    (3375, "omerc"),   # GDM2000 / Peninsula RSO (oblique Mercator)
    (6933, "cea"),     # EASE-Grid 2.0 (cylindrical equal-area)
    (2065, "prime meridian"),  # S-JTSK (Ferro) / Krovak, south-west axes
])
def test_pipe_kind_selected_with_reason(code, frag):
    info = geodesy.epsg_kind(code)
    assert info is not None and info["kind"] == "proj_pipe"
    assert frag in info["pipe_reason"]
    assert info.get("dynamic") is True


@pytest.mark.parametrize("code,box", [
    (3375, (2.0, 6.0, 100.0, 104.0)),     # east,north authority order
    (6933, (-60.0, 60.0, -150.0, 150.0)),
])
def test_pipe_forward_matches_cs2cs_authority_output(code, box):
    lat_lo, lat_hi, lon_lo, lon_hi = box
    lats = np.linspace(lat_lo, lat_hi, 4)
    lons = np.linspace(lon_lo, lon_hi, 4)
    pts = [(la, lo) for la in lats for lo in lons]
    oracle = _cs2cs_raw(pts, code)
    x, y = geodesy.project_forward(np.array([p[1] for p in pts]),
                                   np.array([p[0] for p in pts]), code)
    # both CRS are east,north authority order: columns align directly
    assert np.hypot(x - oracle[:, 0], y - oracle[:, 1]).max() < 1e-4


def test_pipe_axis_normalization_krovak_southwest():
    """EPSG:2065 publishes positive southing/westing; the normalized GIS
    east,north output must be the negated, swapped pair (what gdalwarp's
    traditional-order geotransforms carry for this CRS)."""
    oracle = _cs2cs_raw([(50.0, 15.0)], 2065)  # [southing X, westing Y]
    x, y = geodesy.project_forward(np.array([15.0]), np.array([50.0]), 2065)
    assert x[0] == pytest.approx(-oracle[0, 1], abs=1e-4)  # easting = -westing
    assert y[0] == pytest.approx(-oracle[0, 0], abs=1e-4)  # northing = -southing
    assert x[0] < 0 and y[0] < 0


@pytest.mark.parametrize("code,lon,lat", [
    (3375, 102.0, 4.0),
    (6933, 20.0, -35.0),
    (2065, 15.0, 50.0),
])
def test_pipe_inverse_roundtrip(code, lon, lat):
    x, y = geodesy.project_forward(np.array([lon]), np.array([lat]), code)
    lon2, lat2 = geodesy.project_inverse(x, y, code)
    assert lon2[0] == pytest.approx(lon, abs=1e-7)
    assert lat2[0] == pytest.approx(lat, abs=1e-7)


def test_pipe_proj_string_target():
    """Raw +proj= string with an unimplemented method registers and pipes
    (gdalwarp accepts proj4 text as -t_srs)."""
    code = geodesy.parse_epsg_code("+proj=moll +lon_0=10 +datum=WGS84")
    info = geodesy.epsg_kind(code)
    assert info is not None and info["kind"] == "proj_pipe"
    x, y = geodesy.project_forward(np.array([20.5]), np.array([10.5]), code)
    # pinned against `cs2cs EPSG:4326 +to +proj=moll +lon_0=10 +datum=WGS84`
    assert x[0] == pytest.approx(1041428.803011, abs=1e-3)
    assert y[0] == pytest.approx(1295484.068597, abs=1e-3)
    lon, lat = geodesy.project_inverse(x, y, code)
    assert lon[0] == pytest.approx(20.5, abs=1e-8)
    assert lat[0] == pytest.approx(10.5, abs=1e-8)
    # WKT sidecar is still emitted for the string (projinfo WKT1_GDAL)
    assert (geodesy.epsg_to_wkt(code) or "").startswith("PROJCS[")


def test_pipe_proj_string_axis_flip():
    """+axis=wsu flips both horizontal directions; the normalizer restores
    GIS east,north (lon east of lon_0 gives positive x)."""
    code = geodesy.parse_epsg_code(
        "+proj=cass +lat_0=0 +lon_0=0 +datum=WGS84 +axis=wsu")
    info = geodesy.epsg_kind(code)
    assert info is not None and info["kind"] == "proj_pipe"
    x, y = geodesy.project_forward(np.array([1.0]), np.array([1.0]), code)
    assert x[0] > 0 and y[0] > 0
    lon, lat = geodesy.project_inverse(x, y, code)
    assert lon[0] == pytest.approx(1.0, abs=1e-8)
    assert lat[0] == pytest.approx(1.0, abs=1e-8)


def test_pipe_nonfinite_and_out_of_domain_to_nan():
    # nan input never reaches the subprocess; an out-of-range latitude
    # comes back `* *` from cs2cs — both map to nan like a failed gdalwarp
    # transformer sample
    x, y = geodesy.project_forward(np.array([np.nan, 102.0, 0.0]),
                                   np.array([4.0, 4.0, 1e30]), 3375)
    assert np.isnan(x[0]) and np.isnan(y[0])
    assert np.isfinite(x[1]) and np.isfinite(y[1])
    assert np.isnan(x[2]) and np.isnan(y[2])


def test_pipe_shape_preserved_2d():
    lon = np.linspace(100.0, 104.0, 6).reshape(2, 3)
    lat = np.linspace(2.0, 6.0, 6).reshape(2, 3)
    x, y = geodesy.project_forward(lon, lat, 3375)
    assert x.shape == (2, 3) and y.shape == (2, 3)
    lon2, lat2 = geodesy.project_inverse(x, y, 3375)
    assert np.allclose(lon2, lon, atol=1e-7)
    assert np.allclose(lat2, lat, atol=1e-7)


def test_pipe_unavailable_rejects_with_native_reason(monkeypatch):
    """Without cs2cs the unimplemented method still rejects cleanly, keeping
    the native resolver's reason in the message."""
    monkeypatch.setattr(geodesy, "_cs2cs_available", lambda: False)
    # EPSG:3410 (EASE-Grid Global, spherical cea) — distinct code from the
    # other tests so no cached pipe kind short-circuits the resolution
    with pytest.raises(ValueError, match="cea"):
        geodesy.project_forward(np.array([20.0]), np.array([-60.0]), 3410)
    geodesy._DYN_KIND_CACHE.pop(3410, None)
    geodesy._DYN_UNSUPPORTED.pop(3410, None)


def test_pipe_grad_unit_geographic_crs():
    """EPSG:4807 (NTF Paris) publishes coordinates in GRADS; cs2cs emits
    decimal degrees, so the pipe must rescale to the CRS's own angular unit
    (the emitted WKT declares UNIT["grad"] — a degree geotransform under it
    would misplace the product by ~11%)."""
    info = geodesy.epsg_kind(4807)
    assert info is not None and info["kind"] == "proj_pipe"
    assert info.get("ang_scale") == pytest.approx(200.0 / 180.0, rel=1e-12)
    lon, lat = geodesy.project_forward(np.array([2.3]), np.array([48.85]),
                                       4807)
    # oracle: cs2cs degree output (-0.0365042, 48.8500695) x 10/9
    assert lon[0] == pytest.approx(-0.0365042 * 10 / 9, abs=1e-5)
    assert lat[0] == pytest.approx(48.8500695 * 10 / 9, abs=1e-5)
    lon2, lat2 = geodesy.project_inverse(lon, lat, 4807)
    assert lon2[0] == pytest.approx(2.3, abs=1e-7)
    assert lat2[0] == pytest.approx(48.85, abs=1e-7)


def test_pipe_no_proj_string_export_code():
    """EPSG:5224 (S-JTSK/05 Krovak Modified) has no PROJ-string export.
    On a PROJ build whose cs2cs evaluates mod_krovak it must pipe; on older
    builds it must reject saying the method (not the code) is the problem —
    never the misleading 'not known to PROJ'."""
    geodesy._DYN_KIND_CACHE.pop(5224, None)
    geodesy._DYN_UNSUPPORTED.pop(5224, None)
    info = geodesy.epsg_kind(5224)
    if info is not None:
        assert info["kind"] == "proj_pipe"
        x, y = geodesy.project_forward(np.array([15.0]), np.array([50.0]),
                                       5224)
        assert np.isfinite(x[0]) and np.isfinite(y[0])
    else:
        reason = geodesy.unsupported_reason(5224)
        assert reason is not None and "not evaluable" in reason


def test_pipe_runtime_failure_raises_sarpro_error(monkeypatch):
    """A cs2cs failure during an already-planned transform must surface as
    a SarproError (the CLI's error contract), not a bare ValueError."""
    import subprocess

    from sarpro_tpu.errors import ExternalError, SarproError

    geodesy.epsg_kind(3375)  # ensure registered before breaking subprocess

    def boom(*a, **k):
        raise subprocess.TimeoutExpired(cmd="cs2cs", timeout=1)

    monkeypatch.setattr(subprocess, "run", boom)
    with pytest.raises(SarproError):
        geodesy.project_forward(np.array([102.0]), np.array([4.0]), 3375)
    with pytest.raises(ExternalError):
        geodesy.project_inverse(np.array([445072.0]), np.array([442508.0]),
                                3375)


# --- full warp plan through a piped CRS -------------------------------------
from sarpro_tpu.io import warp as warp_mod  # noqa: E402
from sarpro_tpu.io.raster import RasterReader  # noqa: E402
from sarpro_tpu.io.tiffio import TiffWriter  # noqa: E402
from tests.test_geodesy_dynamic import _gcp_raster  # noqa: E402


def test_pipe_crs_as_warp_source(tmp_path):
    """An affine raster IN a piped CRS (e.g. a product previously warped to
    EASE-Grid 2.0) re-opens and warps back to EPSG:4326 — the inverse pipe
    on the source side of the mapping."""
    rng = np.random.default_rng(7)
    dn = rng.integers(1, 60000, (64, 80)).astype(np.uint16)
    # ~Europe in EASE-Grid 2.0 coordinates (x east, y north)
    x0, y0 = geodesy.project_forward(np.array([11.0]), np.array([46.5]), 6933)
    path = tmp_path / "ease.tiff"
    w = TiffWriter(path)
    w.set_geotransform([float(x0[0]), 500.0, 0.0, float(y0[0]), 0.0, -500.0])
    w.set_projection("EPSG:6933")
    w.write([dn])
    reader = RasterReader(path)
    plan = warp_mod.plan_warp(reader, "EPSG:4326", target_size=None)
    # output must land on the scene's lon/lat neighborhood
    gt = plan.geotransform
    assert 10.5 < gt[0] < 11.5 and 46.0 < gt[3] < 47.0
    ys = np.linspace(0.0, plan.out_rows - 1.0, 9)
    xs = np.linspace(0.0, plan.out_cols - 1.0, 9)
    xx, yy = np.meshgrid(xs, ys)
    ex, ey = plan.exact_source_pixels(xx.ravel(), yy.ravel())
    ix, iy = plan.interp_source_pixels(xx.ravel(), yy.ravel())
    ok = np.isfinite(ex) & np.isfinite(ey)
    assert ok.mean() > 0.9
    assert np.hypot(ix[ok] - ex[ok], iy[ok] - ey[ok]).max() < 0.1
    reader.close()


@pytest.mark.parametrize("code,lon0,lat0", [
    (3375, 102.0, 4.5),    # oblique Mercator (Malaysia)
    (6933, 20.0, -34.5),   # EASE-Grid 2.0 cea (world)
])
def test_warp_mapping_through_pipe_crs(tmp_path, code, lon0, lat0):
    """plan_warp through a cs2cs-piped CRS: the coarse inverse-mapping grid
    stays within 0.1 px of the exact mapping (same criterion as the native
    national grids) and the geotransform is north-up east-right."""
    reader = _gcp_raster(tmp_path, code, lon0, lat0)
    plan = warp_mod.plan_warp(reader, f"EPSG:{code}", target_size=None)
    ys = np.linspace(0.0, plan.out_rows - 1.0, 21)
    xs = np.linspace(0.0, plan.out_cols - 1.0, 21)
    xx, yy = np.meshgrid(xs, ys)
    ex, ey = plan.exact_source_pixels(xx.ravel(), yy.ravel())
    ix, iy = plan.interp_source_pixels(xx.ravel(), yy.ravel())
    ok = np.isfinite(ex) & np.isfinite(ey)
    assert ok.mean() > 0.9
    assert np.hypot(ix[ok] - ex[ok], iy[ok] - ey[ok]).max() < 0.1
    gt = plan.geotransform
    assert gt[1] > 0 and -gt[5] > 0
    reader.close()
