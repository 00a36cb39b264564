"""Dynamic EPSG resolution via PROJ's `projinfo` subprocess.

The reference accepts any PROJ-known `-t_srs` by shelling out to gdalwarp
(src/io/sentinel1.rs:988-1003). Our warp is on-device, so CRS breadth comes
from resolving arbitrary EPSG codes with `projinfo` into the natively
implemented projection methods (tmerc/utm/lcc/aea/laea/polar-stere/somerc/
merc/longlat) plus pipeline-extracted Helmert/NTv2 datum legs. These tests
pin the dynamic path against the system PROJ (`cs2cs`) oracle.
"""
import shutil
import subprocess

import numpy as np
import pytest

from sarpro_tpu.io import geodesy

HAS_PROJ = (shutil.which("cs2cs") is not None
            and shutil.which("projinfo") is not None)
pytestmark = pytest.mark.skipif(not HAS_PROJ, reason="PROJ tools missing")

# code -> (lat_lo, lat_hi, lon_lo, lon_hi, oracle_axis_swap, tol_m)
# tol: exact-method codes (zero/zero-ish datum) get centimeters; legacy
# late-bound datums (ED50...) get the op's stated accuracy class.
DYNAMIC = {
    2180: (49.0, 54.8, 14.2, 24.1, True, 0.02),    # Poland CS92 (tmerc)
    26915: (30.0, 49.0, -96.0, -90.0, False, 0.02),  # NAD83 / UTM 15N
    2263: (40.5, 41.2, -74.2, -71.8, False, 0.02),  # NY/LI LCC 2SP, us-ft
    32140: (27.8, 30.7, -96.5, -93.5, False, 0.02),  # Texas SC LCC (m)
    3572: (60.0, 85.0, -170.0, -130.0, False, 0.02),  # Alaska polar LAEA
    5041: (70.0, 88.0, -120.0, 60.0, False, 0.02),  # UPS via stere +k
    3995: (66.0, 88.0, -60.0, 60.0, False, 0.02),   # Arctic stere lat_ts=71
    28992: (50.8, 53.5, 3.4, 7.2, False, 0.02),     # RD New (sterea 9809)
}
# legacy datum: ops are 1-10 m accuracy and cs2cs/projinfo may rank
# overlapping area ops differently — pin to the accuracy class instead
DYNAMIC_LOOSE = {
    23032: (48.0, 54.0, 7.0, 11.0, False, 5.0),     # ED50 / UTM 32N
}


def _cs2cs(pts_latlon, code):
    inp = "\n".join(f"{lat:.10f} {lon:.10f}" for lat, lon in pts_latlon)
    r = subprocess.run(
        ["cs2cs", "EPSG:4326", f"EPSG:{code}", "-f", "%.6f"],
        input=inp + "\n", capture_output=True, text=True, check=True,
    )
    out = []
    for line in r.stdout.strip().splitlines():
        x, y = line.split()[:2]
        out.append((float(x), float(y)))
    return np.array(out)


def _check_against_oracle(code, box, swap, tol, refine=None):
    lat_lo, lat_hi, lon_lo, lon_hi = box
    if refine:
        geodesy.epsg_kind(code)
        geodesy.refine_dynamic_crs_area(code, *refine)
    lats = np.linspace(lat_lo, lat_hi, 5)
    lons = np.linspace(lon_lo, lon_hi, 5)
    pts = [(la, lo) for la in lats for lo in lons]
    oracle = _cs2cs(pts, code)
    if swap:
        oracle = oracle[:, ::-1]
    lon = np.array([p[1] for p in pts])
    lat = np.array([p[0] for p in pts])
    x, y = geodesy.project_forward(lon, lat, code)
    err = np.hypot(x - oracle[:, 0], y - oracle[:, 1]).max()
    assert err < tol, f"EPSG:{code} worst {err:.4f} vs cs2cs"


@pytest.mark.parametrize("code", sorted(DYNAMIC))
def test_dynamic_forward_matches_proj_oracle(code):
    lat_lo, lat_hi, lon_lo, lon_hi, swap, tol = DYNAMIC[code]
    _check_against_oracle(code, (lat_lo, lat_hi, lon_lo, lon_hi), swap, tol)


@pytest.mark.parametrize("code", sorted(DYNAMIC_LOOSE))
def test_dynamic_legacy_datum_within_op_accuracy(code):
    lat_lo, lat_hi, lon_lo, lon_hi, swap, tol = DYNAMIC_LOOSE[code]
    box = (lat_lo, lat_hi, lon_lo, lon_hi)
    centroid = ((lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2)
    _check_against_oracle(code, box, swap, tol, refine=centroid)


@pytest.mark.parametrize("code", sorted({**DYNAMIC, **DYNAMIC_LOOSE}))
def test_dynamic_inverse_roundtrip(code):
    box = ({**DYNAMIC, **DYNAMIC_LOOSE})[code]
    lat_lo, lat_hi, lon_lo, lon_hi = box[:4]
    lats = np.linspace(lat_lo, lat_hi, 7)
    lons = np.linspace(lon_lo, lon_hi, 7)
    lo, la = np.meshgrid(lons, lats)
    x, y = geodesy.project_forward(lo.ravel(), la.ravel(), code)
    lon2, lat2 = geodesy.project_inverse(x, y, code)
    assert np.hypot(lon2 - lo.ravel(), lat2 - la.ravel()).max() * 111000 \
        < 0.01


@pytest.mark.parametrize("code", sorted({**DYNAMIC, **DYNAMIC_LOOSE}))
def test_dynamic_wkt_is_projinfo_gdal_wkt(code):
    wkt = geodesy.epsg_to_wkt(code)
    assert wkt is not None and wkt.startswith(("PROJCS[", "GEOGCS["))
    assert geodesy.parse_epsg_code(wkt) == code
    r = subprocess.run(["projinfo", "--identify", wkt],
                       capture_output=True, text=True)
    assert f"EPSG:{code}" in r.stdout


@pytest.mark.parametrize("code,frag", [
    # unimplemented methods now pipe through cs2cs (test_geodesy_pipe.py);
    # only codes PROJ itself does not know reject
    (999999, "not known"),     # nonsense code
])
def test_unimplemented_methods_reject_cleanly(code, frag):
    with pytest.raises(ValueError) as exc:
        geodesy.project_forward(np.array([5.0]), np.array([52.0]), code)
    assert frag in str(exc.value)
    assert geodesy.unsupported_reason(code) is not None


def test_us_ft_units_scale():
    """EPSG:2263 coordinates are US survey feet — a metre-level check that
    the +units leg is applied (Empire State Building, known grid coords)."""
    x, y = geodesy.project_forward(np.array([-73.9857]), np.array([40.7484]),
                                   2263)
    # ~987,300 ft E, ~211,700 ft N (NY State Plane Long Island)
    assert abs(x[0] - 987300) < 1000 and abs(y[0] - 211700) < 1000


# --- full warp-plan through a dynamically resolved CRS ----------------------
from sarpro_tpu.io import warp as warp_mod  # noqa: E402
from sarpro_tpu.io.raster import RasterReader  # noqa: E402
from sarpro_tpu.io.tiffio import TiffWriter  # noqa: E402


def _gcp_raster(tmp_path, code, lon0, lat0, span=1.0):
    rng = np.random.default_rng(3)
    rows, cols = 96, 128
    dn = rng.integers(1, 60000, (rows, cols)).astype(np.uint16)
    path = tmp_path / f"dyn{code}.tiff"
    w = TiffWriter(path)
    n = 5
    ties = []
    for iy in range(n):
        for ix in range(n):
            ties.extend([
                ix * (cols - 1) / (n - 1), iy * (rows - 1) / (n - 1), 0.0,
                lon0 + span * ix / (n - 1), lat0 - span * iy / (n - 1), 0.0,
            ])
    w.set_projection("EPSG:4326")
    w.set_tiepoints(ties)
    w.write([dn])
    return RasterReader(path)


@pytest.mark.parametrize("code,lon0,lat0", [
    (2180, 19.5, 52.2),     # Poland CS92 (dynamic tmerc)
    (26915, -93.0, 42.0),   # NAD83 UTM 15N (dynamic utm)
    (2263, -73.5, 40.9),    # NY Long Island (dynamic LCC, us-ft units)
    (23032, 9.0, 51.0),     # ED50 UTM 32N (dynamic datum pipeline)
])
def test_warp_mapping_to_dynamic_grid(tmp_path, code, lon0, lat0):
    """plan_warp through a projinfo-resolved CRS: the coarse inverse-mapping
    grid stays within 0.1 px of the exact f64 mapping (same criterion as the
    native national grids)."""
    reader = _gcp_raster(tmp_path, code, lon0, lat0)
    plan = warp_mod.plan_warp(reader, f"EPSG:{code}", target_size=None)
    ys = np.linspace(0.0, plan.out_rows - 1.0, 41)
    xs = np.linspace(0.0, plan.out_cols - 1.0, 41)
    xx, yy = np.meshgrid(xs, ys)
    ex, ey = plan.exact_source_pixels(xx.ravel(), yy.ravel())
    ix, iy = plan.interp_source_pixels(xx.ravel(), yy.ravel())
    assert np.hypot(ix - ex, iy - ey).max() < 0.1
    gt = plan.geotransform
    assert gt[1] > 0 and -gt[5] > 0
    reader.close()


# --- raw +proj= strings as target CRS (gdalwarp non-EPSG -t_srs parity) -----
def test_proj_string_target_matches_proj_binary():
    """A raw proj4 string registers under a pseudo-code and projects
    identically to the system `proj` binary (cs2cs mishandles proj-string
    CRS targets, so the lower-level binary is the oracle here)."""
    s = ("+proj=lcc +lat_0=40.75 +lon_0=-74 +lat_1=41.03333333 "
         "+lat_2=40.66666667 +x_0=300000 +y_0=0 +ellps=GRS80 +units=m")
    code = geodesy.parse_epsg_code(s)
    assert code is not None and geodesy.epsg_kind(code)["kind"] == "lcc"
    lon = np.array([-74.0, -73.5, -72.9])
    lat = np.array([40.7, 41.0, 40.5])
    x, y = geodesy.project_forward(lon, lat, code)
    inp = "\n".join(f"{lo:.10f} {la:.10f}" for lo, la in zip(lon, lat))
    r = subprocess.run(["proj"] + s.split() + ["-f", "%.6f"],
                       input=inp + "\n", capture_output=True, text=True,
                       check=True)
    oracle = np.array([[float(v) for v in ln.split()[:2]]
                       for ln in r.stdout.strip().splitlines()])
    assert np.hypot(x - oracle[:, 0], y - oracle[:, 1]).max() < 0.01
    # same string registers idempotently; WKT text exists for sidecars
    assert geodesy.parse_epsg_code(s) == code
    assert geodesy.epsg_to_wkt(code)


def test_proj_string_unimplemented_method_pipes():
    # an unimplemented method in a raw string now routes through the cs2cs
    # pipe backend (test_geodesy_pipe.py covers its behavior)
    code = geodesy.parse_epsg_code("+proj=cea +lat_ts=30 +units=m")
    info = geodesy.epsg_kind(code)
    assert info is not None and info["kind"] == "proj_pipe"


def test_proj_string_unknown_method_rejects():
    code = geodesy.parse_epsg_code("+proj=nosuchmethod +datum=WGS84")
    assert geodesy.epsg_kind(code) is None
    assert "nosuchmethod" in geodesy.unsupported_reason(code)


def test_warp_plan_accepts_proj_string(tmp_path):
    s = "+proj=utm +zone=33 +ellps=WGS84 +units=m"
    reader = _gcp_raster(tmp_path, 990777, 15.0, 52.0)
    plan = warp_mod.plan_warp(reader, s, target_size=None)
    ys = np.linspace(0.0, plan.out_rows - 1.0, 21)
    xs = np.linspace(0.0, plan.out_cols - 1.0, 21)
    xx, yy = np.meshgrid(xs, ys)
    ex, ey = plan.exact_source_pixels(xx.ravel(), yy.ravel())
    ix, iy = plan.interp_source_pixels(xx.ravel(), yy.ravel())
    assert np.hypot(ix - ex, iy - ey).max() < 0.1
    reader.close()


def test_authorityless_wkt_target_registers():
    """gdalwarp accepts raw WKT text as -t_srs; WKT without an EPSG
    AUTHORITY routes through projinfo -> proj string -> registry."""
    wkt = (
        'PROJCS["custom",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",41],'
        'PARAMETER["standard_parallel_2",40.5],'
        'PARAMETER["latitude_of_origin",40.75],'
        'PARAMETER["central_meridian",-74],'
        'PARAMETER["false_easting",300000],PARAMETER["false_northing",0],'
        'UNIT["metre",1]]')
    code = geodesy.parse_epsg_code(wkt)
    assert code is not None
    info = geodesy.epsg_kind(code)
    assert info["kind"] == "lcc" and info["lat1"] == 41.0
    x, y = geodesy.project_forward(np.array([-74.0]), np.array([40.75]), code)
    assert abs(x[0] - 300000.0) < 1e-6 and abs(y[0]) < 1e-6


def test_cli_warp_to_dynamic_crs_sidecars(tmp_path):
    """CLI end-to-end with a dynamic EPSG target: .prj carries projinfo's
    GDAL WKT and the JSON sidecar records the same CRS."""
    import json

    import fixtures
    from sarpro_tpu import cli

    safe = fixtures.make_safe(tmp_path, name="S1A_DYN.SAFE")
    out = tmp_path / "dyn.jpg"
    rc = cli.run(["-i", str(safe), "-o", str(out), "-f", "jpeg",
                  "--target-crs", "EPSG:26915", "--resample-alg", "cubic",
                  "--size", "64"])
    assert rc == 0 and out.exists()
    prj = (tmp_path / "dyn.prj").read_text()
    assert prj.startswith('PROJCS["NAD83 / UTM zone 15N"')
    assert 'AUTHORITY["EPSG","26915"]' in prj
    side = json.loads((tmp_path / "dyn.json").read_text())
    assert side["crs"] == prj
