"""Row-sharded warp vs the unsharded sampler on the 8-device virtual CPU
mesh (VERDICT r3 item 4: the reference's headline config is warp + synRGB,
so --shard-devices must distribute the warp's sampling pass).

The XLA backend forms row coordinates as global-offset + local iota
(integers, exact in f32), so every sharded output row must be
BIT-IDENTICAL to the unsharded program's. The tiled Pallas backend cannot
run on the CPU mesh; its table-sharding host math (coefficient rebasing to
shard-local rows) is verified numerically here and on-silicon by
benchmarks/tpu_validate.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sarpro_tpu.io import warp as warp_mod
from sarpro_tpu.parallel.warp import (
    _shard_tables,
    make_row_mesh,
    warp_sample_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_row_mesh(8)


def _mapping(out_rows, out_cols, src_h, src_w, gh=17, gw=17):
    """Smooth affine-ish inverse mapping with mild rotation/shear."""
    yyn, xxn = np.meshgrid(np.linspace(0, 1, gh), np.linspace(0, 1, gw),
                           indexing="ij")
    map_x = (xxn * 0.93 + 0.04 * yyn) * (src_w - 6) + 2.0
    map_y = (yyn * 0.91 + 0.03 * xxn) * (src_h - 6) + 1.5
    return map_x, map_y


@pytest.mark.parametrize("method", ["near", "bilinear", "cubic"])
def test_sharded_warp_bit_identical(rng, mesh, method):
    src = rng.random((200, 160), dtype=np.float32) * 1000.0
    out_rows, out_cols = 120, 144
    map_x, map_y = _mapping(out_rows, out_cols, *src.shape)
    want = np.asarray(warp_mod._warp_sample(
        jnp.asarray(src), jnp.asarray(map_x, jnp.float32),
        jnp.asarray(map_y, jnp.float32), out_rows, out_cols, method))
    got = np.asarray(warp_sample_sharded(
        src, map_x, map_y, out_rows, out_cols, method, mesh))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want, err_msg=method)


def test_sharded_warp_ragged_rows(rng, mesh):
    """Output rows that do not divide the 8-way mesh: the padded rows must
    be trimmed and the true rows stay bit-identical."""
    src = rng.random((96, 96), dtype=np.float32)
    out_rows, out_cols = 107, 96  # 107 = 8*13 + 3
    map_x, map_y = _mapping(out_rows, out_cols, *src.shape)
    want = np.asarray(warp_mod._warp_sample(
        jnp.asarray(src), jnp.asarray(map_x, jnp.float32),
        jnp.asarray(map_y, jnp.float32), out_rows, out_cols, "bilinear"))
    got = np.asarray(warp_sample_sharded(
        src, map_x, map_y, out_rows, out_cols, "bilinear", mesh))
    assert got.shape == (out_rows, out_cols)
    np.testing.assert_array_equal(got, want)


def test_sharded_warp_declines_single_device(rng):
    src = rng.random((64, 64), dtype=np.float32)
    map_x, map_y = _mapping(64, 64, 64, 64)
    assert warp_sample_sharded(src, map_x, map_y, 64, 64, "bilinear",
                               make_row_mesh(1)) is None


def test_shard_tables_rebased_coeffs_match_global(rng):
    """The tiled backend's per-shard coefficient rebasing: evaluating the
    rebased per-tile bilinear mapping at shard-LOCAL rows must reproduce
    the global fit at global rows (A' = A + C·R0, B' = B + D·R0)."""
    from sarpro_tpu.ops.warp_kernel import TR, plan_tiled_warp

    src_h = src_w = 640
    out_rows, out_cols = 512, 512
    map_x, map_y = _mapping(out_rows, out_cols, src_h, src_w)
    n = 4
    nty_pad = -(-(-(-out_rows // TR)) // n) * n
    plan = plan_tiled_warp(np.asarray(map_x, np.float64),
                           np.asarray(map_y, np.float64), src_h, src_w,
                           out_rows, out_cols, "cubic",
                           plan_rows=nty_pad * TR)
    assert plan is not None, "plan preconditions should hold for this config"
    _oy, _ox, cxc, _cyc, nty, ntx = plan
    assert nty == nty_pad
    _oys, _oxs, cxs, _cys, ntl, ntl8 = _shard_tables(plan, n, ntx, nty_pad)
    blk_rows = (nty_pad // n) * TR
    cx_g = cxc.reshape(nty, ntx, 4)
    for shard in (0, 1, n - 1):
        for trow in (0, nty_pad // n - 1):
            g = cx_g[shard * (nty_pad // n) + trow, 3]       # a global tile
            loc = cxs[shard * ntl8 + trow * ntx + 3]          # same, rebased
            for r_loc, c in ((0.0, 10.0), (7.0, 100.0)):
                r_glob = shard * blk_rows + trow * TR + r_loc
                s_glob = g[0] + g[1] * c + g[2] * r_glob + g[3] * r_glob * c
                r_l = trow * TR + r_loc  # local = global - shard offset
                s_loc = (loc[0] + loc[1] * c + loc[2] * r_l
                         + loc[3] * r_l * c)
                np.testing.assert_allclose(s_loc, s_glob, rtol=0, atol=2e-3)


def test_warp_to_crs_sharded_matches_unsharded(rng, mesh, tmp_path):
    """The full warp_to_crs with SHARD_DEVICES set: bit-identical raster and
    identical georeferencing vs the unsharded run (GCP/TPS fixture)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import fixtures

    from sarpro_tpu.io.raster import RasterReader

    path = tmp_path / "gcp.tiff"
    data = (rng.random((96, 128)) * 3000).astype(np.uint16)
    fixtures._write_measurement_tiff(path, data)
    r1 = RasterReader(path)
    want = warp_mod.warp_to_crs(r1, "EPSG:4326", resample_alg="bilinear")
    r1.close()
    r2 = RasterReader(path)
    token = warp_mod.SHARD_DEVICES.set(8)
    try:
        got = warp_mod.warp_to_crs(r2, "EPSG:4326", resample_alg="bilinear")
    finally:
        warp_mod.SHARD_DEVICES.reset(token)
    r2.close()
    assert got.epsg == want.epsg
    np.testing.assert_allclose(got.geotransform, want.geotransform)
    # the sharded and unsharded programs compile separately; LLVM's FMA
    # contraction may differ per shape, so a small fraction of samples can
    # land one f32 ulp apart (observed ~0.6% at 1.6e-5 rel on this output
    # shape). Semantics demand near-exactness, not identical codegen.
    g = np.asarray(got.data)
    w = np.asarray(want.data)
    np.testing.assert_allclose(g, w, rtol=5e-5, atol=1e-3)
    assert (g == w).mean() > 0.98


def test_multiband_warp_engages_sharded_sampler(rng, tmp_path, monkeypatch):
    """Dual-pol + target_crs + shard-devices: load_pair runs band loads in
    a ThreadPoolExecutor, and context vars do not cross pool threads by
    default — the loads must copy the caller's context or the sharded warp
    silently never engages for exactly the headline (warp + synRGB)
    config. Asserts engagement, not just output equality."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import fixtures

    import sarpro_tpu.parallel.warp as pwarp
    from sarpro_tpu import api
    from sarpro_tpu.params import ProcessingParams
    from sarpro_tpu.types import (
        AutoscaleStrategy, OutputFormat, Polarization,
    )

    calls = []
    real = pwarp.warp_sample_sharded

    def spy(*a, **kw):
        out = real(*a, **kw)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(pwarp, "warp_sample_sharded", spy)
    base = fixtures.make_safe(tmp_path, name="mb.SAFE", seed=5)
    params = ProcessingParams(
        format=OutputFormat.JPEG, polarization=Polarization.MULTIBAND,
        autoscale=AutoscaleStrategy.CLAHE, size=64,
        target_crs="EPSG:4326", resample_alg="cubic",
    )
    out = tmp_path / "mb.jpg"
    api.process_safe_to_path(base, out, params, shard_devices=8)
    assert calls and all(calls), \
        "sharded warp sampler never engaged for the dual-pol warp config"
    ref = tmp_path / "ref.jpg"
    api.process_safe_to_path(base, ref, params, fast=True)
    # the separately-compiled sharded/unsharded samplers can diverge by one
    # f32 ulp on FMA-sensitive shapes (see
    # test_warp_to_crs_sharded_matches_unsharded), which after quantization
    # is at most one u8 level — compare decoded pixels at that tolerance
    # instead of encoder bytes, which amplify a single-level flip
    if out.read_bytes() != ref.read_bytes():
        import PIL.Image

        a = np.asarray(PIL.Image.open(out)).astype(np.int32)
        b = np.asarray(PIL.Image.open(ref)).astype(np.int32)
        assert np.abs(a - b).max() <= 3  # ±1 input level through q100 JPEG
