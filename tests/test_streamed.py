"""Streamed big-scene pipelines vs the fused single program.

The streamed path (core/streamed.py) accumulates integer histograms and
exact min/max across row chunks and applies per-pixel ops with global row
offsets; mean/std (Adaptive's inputs) derive from the integer histogram,
so the output must be BIT-IDENTICAL to fused for EVERY strategy.

Chunk sizes are chosen so chunks cut CLAHE tiles mid-row and leave a ragged
tail chunk.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sarpro_tpu.core import fused, streamed
from sarpro_tpu.types import AutoscaleStrategy, BitDepth
from test_stats import sar_like


@pytest.mark.parametrize(
    "strategy",
    [AutoscaleStrategy.CLAHE, AutoscaleStrategy.ROBUST,
     AutoscaleStrategy.STANDARD, AutoscaleStrategy.EQUALIZED,
     AutoscaleStrategy.TAMED, AutoscaleStrategy.DEFAULT],
)
def test_streamed_synrgb_bit_identical(rng, strategy):
    vv = sar_like(rng, (200, 176))
    vh = sar_like(rng, (200, 176))
    want = np.asarray(fused.synrgb_pipeline(
        vv, vh, strategy=strategy, target_size=None, pad=False))
    got = np.asarray(streamed.synrgb_streamed(
        vv, vh, strategy=strategy, chunk_rows=48))  # ragged tail: 200 = 4*48+8
    np.testing.assert_array_equal(got, want)


def test_streamed_dct_layout_matches_fused(rng):
    """layout='dct' must produce the SAME coefficient blocks as the fused
    program's channel_order='dct' (block math is local, so per-chunk DCT
    equals whole-image DCT bit-for-bit), including a ragged bottom chunk
    (196 rows: 8-aligned interior boundaries at 48, then 4 rows of true
    bottom edge replication)."""
    vv = sar_like(rng, (196, 176))
    vh = sar_like(rng, (196, 176))
    want = np.asarray(fused.synrgb_pipeline(
        vv, vh, strategy=AutoscaleStrategy.CLAHE, target_size=None,
        pad=False, channel_order="dct"))
    got = streamed.synrgb_streamed(
        vv, vh, strategy=AutoscaleStrategy.CLAHE, chunk_rows=48,
        layout="dct")
    assert got.dtype == np.int16 and got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_streamed_gray_dct_matches_fused(rng):
    dn = sar_like(rng, (120, 88))
    want = np.asarray(fused.grayscale_pipeline(
        dn, strategy=AutoscaleStrategy.ROBUST, bit_depth=BitDepth.U8,
        target_size=None, pad=True, jpeg_dct=True))
    got = streamed.grayscale_streamed(
        dn, strategy=AutoscaleStrategy.ROBUST, bit_depth=BitDepth.U8,
        pad=True, chunk_rows=40, jpeg_dct=True)
    np.testing.assert_array_equal(got, want)


def test_streamed_synrgb_adaptive_bit_identical(rng):
    vv = sar_like(rng, (160, 128))
    vh = sar_like(rng, (160, 128))
    want = np.asarray(fused.synrgb_pipeline(
        vv, vh, strategy=AutoscaleStrategy.ADAPTIVE, target_size=None))
    got = np.asarray(streamed.synrgb_streamed(
        vv, vh, strategy=AutoscaleStrategy.ADAPTIVE, chunk_rows=64))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bit_depth", [BitDepth.U8, BitDepth.U16])
def test_streamed_grayscale_bit_identical(rng, bit_depth):
    x = sar_like(rng, (176, 144))
    want = np.asarray(fused.grayscale_pipeline(
        x, strategy=AutoscaleStrategy.CLAHE, bit_depth=bit_depth,
        target_size=None))
    got = np.asarray(streamed.grayscale_streamed(
        x, strategy=AutoscaleStrategy.CLAHE, bit_depth=bit_depth,
        chunk_rows=40))
    np.testing.assert_array_equal(got, want)


def test_streamed_pad_and_default_mode(rng):
    vv = sar_like(rng, (96, 64))
    vh = sar_like(rng, (96, 64))
    want = np.asarray(fused.synrgb_pipeline(
        vv, vh, strategy=AutoscaleStrategy.ROBUST, target_size=None,
        pad=True))
    got = np.asarray(streamed.synrgb_streamed(
        vv, vh, strategy=AutoscaleStrategy.ROBUST, pad=True, chunk_rows=32))
    assert got.shape == (96, 96, 3)
    np.testing.assert_array_equal(got, want)


def test_streamed_single_chunk_degenerates_to_fused(rng):
    vv = sar_like(rng, (64, 96))
    vh = sar_like(rng, (64, 96))
    want = np.asarray(fused.synrgb_pipeline(
        vv, vh, strategy=AutoscaleStrategy.CLAHE, target_size=None))
    got = np.asarray(streamed.synrgb_streamed(
        vv, vh, strategy=AutoscaleStrategy.CLAHE, chunk_rows=4096))
    np.testing.assert_array_equal(got, want)


def test_streamed_pad_suppressed_bit_identical(rng):
    """Code-review gap: the pad-zeros histogram adjustment (hist[0] +=
    2*(m²−rows·cols)) is the one place streamed reconstructs fused's
    behavior arithmetically instead of running the same kernel — it must be
    exercised with a SUPPRESSED composition (CLAHE), not just ROBUST."""
    vv = sar_like(rng, (80, 128))  # rectangular: pad adds 48*128*2 zeros
    vh = sar_like(rng, (80, 128))
    want = np.asarray(fused.synrgb_pipeline(
        vv, vh, strategy=AutoscaleStrategy.CLAHE, target_size=None,
        pad=True))
    got = np.asarray(streamed.synrgb_streamed(
        vv, vh, strategy=AutoscaleStrategy.CLAHE, pad=True, chunk_rows=48))
    assert got.shape == (128, 128, 3)
    np.testing.assert_array_equal(got, want)


def test_streamed_floor_host_matches_reference_semantics():
    """Host-side int64 floor (big totals overflow the in-graph int32
    cumsum): same counting semantics as fused._suppressed_floor."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    hist = rng.integers(0, 10000, 256).astype(np.int64)
    total = int(hist.sum())
    got = float(np.asarray(streamed._suppressed_floor_host(hist, total)))
    want = float(np.asarray(fused._suppressed_floor(
        jnp.asarray(hist, jnp.int32), total)))
    assert got == want
    # >int32 totals: no wrap (the in-graph version would overflow here)
    big = np.zeros(256, np.int64)
    big[0] = 3_000_000_000
    big[50] = 3_000_000_000
    v = float(np.asarray(streamed._suppressed_floor_host(big, int(big.sum()))))
    assert v == 3.0  # floor at bin 0 (+3 cushion)


def test_stats_finalize_host_mirrors_device():
    """The host-f64 finalize (engaged for >int32 valid-pixel counts) must
    match the device finalize on an in-range histogram."""
    import numpy as np

    from sarpro_tpu.core import fused
    from sarpro_tpu.core.streamed import _stats_finalize_host

    rng = np.random.default_rng(3)
    hist = rng.integers(0, 100000, fused.NUM_BINS).astype(np.int64)
    count = int(hist.sum())
    mn, mx = -42.0, -7.5
    dev = fused._stats_finalize(
        jnp.asarray(hist, jnp.int32), jnp.asarray(np.int32(count)),
        jnp.float32(mn), jnp.float32(mx))
    host = _stats_finalize_host(hist, count, mn, mx)
    for k in ("p01", "p02", "p05", "p25", "median", "p75", "p95", "p99",
              "mean", "std", "min", "max"):
        np.testing.assert_allclose(float(host[k]), float(np.asarray(dev[k])),
                                   rtol=1e-5, atol=1e-4)


def test_stats_finalize_host_past_int32():
    """Counts beyond int32 must not wrap: a uniform histogram of 3 Gpx
    places the median at the bin midpoint."""
    import numpy as np

    from sarpro_tpu.core import fused
    from sarpro_tpu.core.streamed import _stats_finalize_host

    per_bin = (3_000_000_000 // fused.NUM_BINS) + 1
    hist = np.full(fused.NUM_BINS, per_bin, np.int64)
    count = int(hist.sum())
    assert count > np.iinfo(np.int32).max
    s = _stats_finalize_host(hist, count, 0.0, 100.0)
    assert abs(float(s["median"]) - 50.0) < 0.1
    assert abs(float(s["p01"]) - 1.0) < 0.1
    assert abs(float(s["p99"]) - 99.0) < 0.1
