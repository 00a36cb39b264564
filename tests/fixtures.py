"""Synthetic Sentinel-1 SAFE fixtures (SURVEY.md §4 item 1).

Generates tiny .SAFE trees — manifest.safe + annotation XML + small GCP'd
measurement GeoTIFFs — exercising the reader paths: dual-pol, HH/HV-only,
non-GRD rejection, missing-pol skip.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from sarpro_tpu.io.tiffio import TiffWriter, TAG_MODEL_TIEPOINT, TYPE_DOUBLE

MANIFEST_TEMPLATE = """<?xml version="1.0" encoding="UTF-8"?>
<xfdu:XFDU xmlns:xfdu="urn:ccsds:schema:xfdu:1">
  <metadataSection>
    <metadataObject ID="platform">
      <metadataWrap><xmlData>
        <safe:platform xmlns:safe="http://www.esa.int/safe/sentinel-1.0">
          <safe:familyName>SENTINEL-1</safe:familyName>
          <safe:number>A</safe:number>
          <safe:instrument>
            <safe:familyName abbreviation="SAR">Synthetic Aperture Radar</safe:familyName>
            <safe:extension>
              <s1sarl1:instrumentMode xmlns:s1sarl1="http://www.esa.int/safe/sentinel-1.0/sentinel-1/sar/level-1">
                <s1sarl1:mode>IW</s1sarl1:mode>
              </s1sarl1:instrumentMode>
            </safe:extension>
          </safe:instrument>
        </safe:platform>
      </xmlData></metadataWrap>
    </metadataObject>
    <metadataObject ID="acquisitionPeriod">
      <metadataWrap><xmlData>
        <safe:acquisitionPeriod xmlns:safe="http://www.esa.int/safe/sentinel-1.0">
          <safe:startTime>2025-07-06T20:43:46.579983</safe:startTime>
          <safe:stopTime>2025-07-06T20:44:11.578154</safe:stopTime>
        </safe:acquisitionPeriod>
      </xmlData></metadataWrap>
    </metadataObject>
    <metadataObject ID="measurementOrbitReference">
      <metadataWrap><xmlData>
        <safe:orbitReference xmlns:safe="http://www.esa.int/safe/sentinel-1.0">
          <safe:orbitNumber type="start">59968</safe:orbitNumber>
          <safe:extension>
            <s1:orbitProperties xmlns:s1="http://www.esa.int/safe/sentinel-1.0/sentinel-1">
              <s1:pass>{pass_direction}</s1:pass>
            </s1:orbitProperties>
          </safe:extension>
        </safe:orbitReference>
      </xmlData></metadataWrap>
    </metadataObject>
    <metadataObject ID="generalProductInformation">
      <metadataWrap><xmlData>
        <s1sarl1:standAloneProductInformation xmlns:s1sarl1="http://www.esa.int/safe/sentinel-1.0/sentinel-1/sar/level-1">
          <s1sarl1:instrumentConfigurationID>8</s1sarl1:instrumentConfigurationID>
          <s1sarl1:missionDataTakeID>487183</s1sarl1:missionDataTakeID>
          {polarisation_entries}
          <s1sarl1:productClass>S</s1sarl1:productClass>
          <s1sarl1:productType>{product_type}</s1sarl1:productType>
        </s1sarl1:standAloneProductInformation>
      </xmlData></metadataWrap>
    </metadataObject>
    <metadataObject ID="processing">
      <metadataWrap><xmlData>
        <safe:processing xmlns:safe="http://www.esa.int/safe/sentinel-1.0" name="SLC Post Processing">
          <safe:facility country="Germany" name="DLR-Oberpfaffenhofen" organisation="ESA" site="DLR-Oberpfaffenhofen">
            <safe:name>DLR-Oberpfaffenhofen</safe:name>
            <safe:software>
              <safe:name>Sentinel-1 IPF</safe:name>
              <safe:version>003.91</safe:version>
            </safe:software>
          </safe:facility>
        </safe:processing>
      </xmlData></metadataWrap>
    </metadataObject>
  </metadataSection>
</xfdu:XFDU>
"""

ANNOTATION_TEMPLATE = """<?xml version="1.0" encoding="UTF-8"?>
<product>
  <adsHeader>
    <missionId>S1A</missionId>
    <productType>{product_type}</productType>
    <polarisation>{pol}</polarisation>
    <mode>IW</mode>
    <startTime>2025-07-06T20:43:46.579983</startTime>
    <stopTime>2025-07-06T20:44:11.578154</stopTime>
    <absoluteOrbitNumber>59968</absoluteOrbitNumber>
    <missionDataTakeId>487183</missionDataTakeId>
  </adsHeader>
  <generalAnnotation>
    <productInformation>
      <pass>{pass_direction}</pass>
      <rangeSamplingRate>64345238.12571428</rangeSamplingRate>
      <radarFrequency>5405000454.33435</radarFrequency>
    </productInformation>
    <downlinkInformation>
      <prf>1717.128973878037</prf>
      <downlinkValues>
        <txPulseLength>5.240703971123505e-05</txPulseLength>
        <txPulseRampRate>1078230321255.894</txPulseRampRate>
      </downlinkValues>
    </downlinkInformation>
    <orbitList>
      <orbitStateVector>
        <vx>-1000.0</vx><vy>2000.0</vy><vz>7000.0</vz>
      </orbitStateVector>
      <orbitStateVector>
        <vx>-1100.0</vx><vy>2100.0</vy><vz>6900.0</vz>
      </orbitStateVector>
      <orbitStateVector>
        <vx>-1200.0</vx><vy>2200.0</vy><vz>6800.0</vz>
      </orbitStateVector>
    </orbitList>
  </generalAnnotation>
  <imageAnnotation>
    <imageInformation>
      <slantRangeTime>0.005331704801236436</slantRangeTime>
      <rangePixelSpacing>10.0</rangePixelSpacing>
      <azimuthPixelSpacing>10.0</azimuthPixelSpacing>
      <numberOfSamples>{samples}</numberOfSamples>
      <numberOfLines>{lines}</numberOfLines>
      <lines>{lines}</lines>
    </imageInformation>
  </imageAnnotation>{geolocation_block}
</product>
"""

GEOLOCATION_POINT_TEMPLATE = """
      <geolocationGridPoint>
        <azimuthTime>2025-07-06T20:43:46.579983</azimuthTime>
        <slantRangeTime>0.0053317048</slantRangeTime>
        <line>{line}</line>
        <pixel>{pixel}</pixel>
        <latitude>{lat}</latitude>
        <longitude>{lon}</longitude>
        <height>0.0</height>
        <incidenceAngle>30.0</incidenceAngle>
      </geolocationGridPoint>"""


def geolocation_grid_block(rows: int, cols: int, lon0=11.0, lat0=46.0,
                           span_deg=0.25, n=5) -> str:
    """geolocationGrid annotation section over the same lon/lat lattice as
    the GCP tiepoints of _write_measurement_tiff."""
    pts = []
    for iy in range(n):
        for ix in range(n):
            pts.append(GEOLOCATION_POINT_TEMPLATE.format(
                line=iy * (rows - 1) / (n - 1),
                pixel=ix * (cols - 1) / (n - 1),
                lon=lon0 + span_deg * ix / (n - 1),
                lat=lat0 - span_deg * iy / (n - 1),
            ))
    return (
        "\n  <geolocationGrid>\n"
        f'    <geolocationGridPointList count="{n * n}">'
        + "".join(pts)
        + "\n    </geolocationGridPointList>\n  </geolocationGrid>"
    )


def _write_measurement_tiff(path: Path, data: np.ndarray,
                            gcp_lon0=11.0, gcp_lat0=46.0, span_deg=0.25):
    """u16 measurement GeoTIFF with a 5x5 WGS84 GCP lattice (like real S1 GRD:
    no affine geotransform, only tiepoints)."""
    rows, cols = data.shape
    w = TiffWriter(path)
    # GCP lattice as multiple tiepoints (real S1 GRD rasters carry GCPs, not
    # an affine geotransform)
    n = 5
    ties = []
    for iy in range(n):
        for ix in range(n):
            px = ix * (cols - 1) / (n - 1)
            py = iy * (rows - 1) / (n - 1)
            lon = gcp_lon0 + span_deg * ix / (n - 1)
            lat = gcp_lat0 - span_deg * iy / (n - 1)
            ties.extend([px, py, 0.0, lon, lat, 0.0])
    w.set_projection("EPSG:4326")  # GCP SRS
    w.set_tiepoints(ties)
    w.write([data.astype(np.uint16)])


def make_safe(
    root: Path,
    name: str = "S1A_IW_GRDH_1SDV_20250706T204346.SAFE",
    pols=("vv", "vh"),
    product_type: str = "GRD",
    shape=(96, 128),
    pass_direction: str = "ASCENDING",
    seed: int = 7,
    with_affine_geotransform: bool = False,
    with_geolocation_grid: bool = False,
    tiff_gcps: bool = True,
) -> Path:
    """Create a synthetic SAFE tree and return its path."""
    rng = np.random.default_rng(seed)
    base = root / name
    (base / "annotation").mkdir(parents=True, exist_ok=True)
    (base / "measurement").mkdir(parents=True, exist_ok=True)

    pol_entries = "\n      ".join(
        f"<s1sarl1:transmitterReceiverPolarisation>{p.upper()}"
        f"</s1sarl1:transmitterReceiverPolarisation>"
        for p in pols
    )
    (base / "manifest.safe").write_text(
        MANIFEST_TEMPLATE.format(
            product_type=product_type,
            pass_direction=pass_direction,
            polarisation_entries=pol_entries,
        )
    )
    rows, cols = shape
    gg_block = (geolocation_grid_block(rows, cols)
                if with_geolocation_grid else "")
    for pol in pols:
        (base / "annotation" / f"s1a-iw-grd-{pol}-001.xml").write_text(
            ANNOTATION_TEMPLATE.format(
                product_type=product_type, pol=pol.upper(),
                pass_direction=pass_direction, samples=cols, lines=rows,
                geolocation_block=gg_block,
            )
        )
        # SAR-like lognormal DN with some zeros
        dn = rng.lognormal(5.0 if pol in ("vv", "hh") else 4.2, 1.1, shape)
        dn = np.clip(dn, 0, 65535).astype(np.uint16)
        dn[rng.random(shape) < 0.02] = 0
        tif = base / "measurement" / f"s1a-iw-grd-{pol}-001.tiff"
        if with_affine_geotransform:
            w = TiffWriter(tif)
            w.set_geotransform([500000.0, 10.0, 0.0, 5100000.0, 0.0, -10.0])
            w.set_projection("EPSG:32632")
            w.write([dn])
        elif not tiff_gcps:
            # bare raster: no projection, no tiepoints (geolocation must come
            # from the annotation grid)
            TiffWriter(tif).write([dn])
        else:
            _write_measurement_tiff(tif, dn)
    return base
