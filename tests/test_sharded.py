"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4 item 3).

VERDICT r2 item 6: every scene in the batch is compared (not just scene 0),
and equality is exact for strategies whose sharded reductions are integer
(histograms/min/max psum exactly; only ADAPTIVE consumes the float-ordered
mean/std sums, so only it gets a tolerance).
"""
import jax
import numpy as np
import pytest

from sarpro_tpu.core import fused
from sarpro_tpu.parallel import make_mesh
from sarpro_tpu.parallel.sharded import grayscale_batch, synrgb_batch
from sarpro_tpu.types import AutoscaleStrategy, BitDepth
from test_stats import sar_like


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["scene"] * mesh.shape["row"] == 8
    assert mesh.shape["row"] >= 2  # real row sharding, not a trivial axis


def _assert_scenes_match(out, want_fn, exact=True, label=""):
    for i in range(out.shape[0]):
        want = np.asarray(want_fn(i))
        if exact:
            np.testing.assert_array_equal(
                out[i], want, err_msg=f"{label} scene {i}")
        else:
            diff = np.abs(out[i].astype(np.int64) - want.astype(np.int64))
            assert (diff <= 1).mean() >= 0.999, f"{label} scene {i}"


def test_sharded_synrgb_matches_single_device(rng, mesh):
    """CLAHE synRGB: tile histograms and percentile histograms psum as
    integers, so every scene must match the unsharded program bit-for-bit."""
    n_scene = mesh.shape["scene"]
    rows = 64 * mesh.shape["row"]
    vv = np.stack([sar_like(rng, (rows, 96)) for _ in range(n_scene)])
    vh = np.stack([sar_like(rng, (rows, 96)) for _ in range(n_scene)])
    out = np.asarray(synrgb_batch(
        vv, vh, mesh, strategy=AutoscaleStrategy.CLAHE, target_size=None
    ))
    assert out.shape == (n_scene, rows, 96, 3)
    _assert_scenes_match(
        out,
        lambda i: fused.synrgb_pipeline(
            vv[i], vh[i], strategy=AutoscaleStrategy.CLAHE, target_size=None),
        exact=True, label="clahe")


def test_sharded_grayscale_batch(rng, mesh):
    n_scene = mesh.shape["scene"]
    rows = 32 * mesh.shape["row"]
    dn = np.stack([sar_like(rng, (rows, 64)) for _ in range(n_scene)])
    out = np.asarray(grayscale_batch(
        dn, mesh, strategy=AutoscaleStrategy.ROBUST, bit_depth=BitDepth.U16
    ))
    assert out.shape == (n_scene, rows, 64)
    _assert_scenes_match(
        out,
        lambda i: fused.grayscale_pipeline(
            dn[i], strategy=AutoscaleStrategy.ROBUST, bit_depth=BitDepth.U16),
        exact=True, label="robust-u16")


def test_sharded_adaptive_bit_identical(rng, mesh):
    """ADAPTIVE's mean/std derive from the psum'd integer histogram, so the
    sharded program matches the unsharded one exactly (VERDICT r4 item 7)."""
    n_scene = mesh.shape["scene"]
    rows = 32 * mesh.shape["row"]
    dn = np.stack([sar_like(rng, (rows, 64)) for _ in range(n_scene)])
    out = np.asarray(grayscale_batch(
        dn, mesh, strategy=AutoscaleStrategy.ADAPTIVE, bit_depth=BitDepth.U8
    ))
    _assert_scenes_match(
        out,
        lambda i: fused.grayscale_pipeline(
            dn[i], strategy=AutoscaleStrategy.ADAPTIVE, bit_depth=BitDepth.U8),
        exact=True, label="adaptive")


def test_gspmd_fallback_resample_pad_matches_unsharded(rng, mesh):
    """The GSPMD fallback branch (_synrgb_batch_jit: target_size + pad) must
    reproduce the unsharded program on every scene (VERDICT r2 item 6 —
    previously untested)."""
    n_scene = mesh.shape["scene"]
    rows = 48 * mesh.shape["row"]
    vv = np.stack([sar_like(rng, (rows, 144)) for _ in range(n_scene)])
    vh = np.stack([sar_like(rng, (rows, 144)) for _ in range(n_scene)])
    out = np.asarray(synrgb_batch(
        vv, vh, mesh, strategy=AutoscaleStrategy.CLAHE, target_size=96,
        pad=True,
    ))
    assert out.shape == (n_scene, 96, 96, 3)
    from sarpro_tpu.ops.kernels import force_xla_fallbacks

    def want(i):
        # the fallback path traces with XLA kernels; compare like-for-like
        with force_xla_fallbacks():
            return fused.synrgb_pipeline(
                vv[i], vh[i], strategy=AutoscaleStrategy.CLAHE,
                target_size=96, pad=True)

    _assert_scenes_match(out, want, exact=True, label="gspmd-pad")


def test_gspmd_fallback_grayscale_target_size(rng, mesh):
    n_scene = mesh.shape["scene"]
    rows = 48 * mesh.shape["row"]
    dn = np.stack([sar_like(rng, (rows, 120)) for _ in range(n_scene)])
    out = np.asarray(grayscale_batch(
        dn, mesh, strategy=AutoscaleStrategy.STANDARD, bit_depth=BitDepth.U8,
        target_size=64, pad=True,
    ))
    assert out.shape == (n_scene, 64, 64)
    from sarpro_tpu.ops.kernels import force_xla_fallbacks

    def want(i):
        with force_xla_fallbacks():
            return fused.grayscale_pipeline(
                dn[i], strategy=AutoscaleStrategy.STANDARD,
                bit_depth=BitDepth.U8, target_size=64, pad=True)

    _assert_scenes_match(out, want, exact=True, label="gspmd-gray")


def test_graft_entry_contract():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 256, 3)
    mod.dryrun_multichip(8)


def test_shardmap_clahe_tile_straddles_shard_boundary(rng, mesh):
    """Row shards that cut through CLAHE tile rows (VERDICT r1 item 3): the
    psum-combined tile histograms and the global-row-offset bilinear apply
    must agree with the unsharded program even when a shard boundary lands
    mid-tile (here rows=328, tile_h=41, 4-way row axis → boundary at 82)."""
    n_scene = mesh.shape["scene"]
    rows = 41 * mesh.shape["row"] * 2  # tile_h = ceil(rows/8) never aligns
    vv = np.stack([sar_like(rng, (rows, 96)) for _ in range(n_scene)])
    vh = np.stack([sar_like(rng, (rows, 96)) for _ in range(n_scene)])
    out = np.asarray(synrgb_batch(
        vv, vh, mesh, strategy=AutoscaleStrategy.CLAHE, target_size=None
    ))
    _assert_scenes_match(
        out,
        lambda i: fused.synrgb_pipeline(
            vv[i], vh[i], strategy=AutoscaleStrategy.CLAHE, target_size=None),
        exact=True, label="straddle")


def test_shardmap_tamed_and_equalized(rng, mesh):
    """Non-CLAHE strategies through the shard_map path (tamed exercises the
    band-specific window + suppressed synRGB's psum'd combined histogram)."""
    n_scene = mesh.shape["scene"]
    rows = 32 * mesh.shape["row"]
    vv = np.stack([sar_like(rng, (rows, 64)) for _ in range(n_scene)])
    vh = np.stack([sar_like(rng, (rows, 64)) for _ in range(n_scene)])
    for strat in (AutoscaleStrategy.TAMED, AutoscaleStrategy.EQUALIZED):
        out = np.asarray(synrgb_batch(vv, vh, mesh, strategy=strat,
                                      target_size=None))
        _assert_scenes_match(
            out,
            lambda i, s=strat: fused.synrgb_pipeline(
                vv[i], vh[i], strategy=s, target_size=None),
            exact=True, label=str(strat))


def test_gspmd_fallback_ycbcr_planar_sharding(rng, mesh):
    """channel_order='ycbcr' emits PLANAR (scene, 3, rows, cols): the output
    sharding constraint must keep the 3-length channel axis replicated and
    move the 'row' axis to the rows dim (review finding: the interleaved
    RGB spec tried to split the channel axis across row shards)."""
    n_scene = mesh.shape["scene"]
    vv = np.stack([sar_like(rng, (96, 144)) for _ in range(n_scene)])
    vh = np.stack([sar_like(rng, (96, 144)) for _ in range(n_scene)])
    out = np.asarray(synrgb_batch(
        vv, vh, mesh, strategy=AutoscaleStrategy.CLAHE, target_size=96,
        pad=True, channel_order="ycbcr",
    ))
    assert out.shape == (n_scene, 3, 96, 96)
    rgb = np.asarray(synrgb_batch(
        vv, vh, mesh, strategy=AutoscaleStrategy.CLAHE, target_size=96,
        pad=True, channel_order="rgb",
    ))
    # same pixels, planar JFIF YCbCr vs interleaved RGB
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    assert np.abs(out[:, 0].astype(np.float64) - y).max() <= 1
