"""Golden tests: full scalar pipeline (dB -> autoscale -> quantize) vs oracle."""
import numpy as np
import pytest

import oracle
from sarpro_tpu.core import pipeline
from sarpro_tpu.types import AutoscaleStrategy, BitDepth
from test_stats import sar_like


def _assert_quantized_close(got, want, max_val, frac_tol=0.02, hard_abs=None):
    """Quantized outputs may differ where f32 histogram binning flips a
    percentile bin (window shifts by <= 1 bin width). Assert: almost all
    pixels within 1 level, and any deviation bounded by ~2 histogram bins
    worth of output range."""
    got = np.asarray(got, np.int64)
    want = np.asarray(want, np.int64)
    diff = np.abs(got - want)
    assert (diff <= 1).mean() >= 1.0 - frac_tol, f"{(diff > 1).mean():.4%} pixels off by >1"
    bound = hard_abs if hard_abs is not None else max(2.0 * max_val / 4096.0 * 40, 8)
    assert diff.max() <= bound, f"max diff {diff.max()}"


def test_db_and_mask_match_oracle(rng):
    x = sar_like(rng)
    db_o, mask_o = oracle.db_and_mask(x)
    db, mask, _ = pipeline.compute_db_and_stats(x)
    # f32 log approximation: sub-millidB accuracy (bin width is ~0.01 dB+)
    np.testing.assert_allclose(np.asarray(db), db_o, atol=1e-3, rtol=0)
    # mask may only differ for values within f32 noise of the -50 dB cut
    disagree = np.asarray(mask) != mask_o
    near = np.abs(db_o + 50.0) < 1e-3
    assert np.all(~disagree | near)


@pytest.mark.parametrize("bit_depth", [BitDepth.U8, BitDepth.U16])
def test_standard_autoscale(rng, bit_depth):
    x = sar_like(rng)
    db_o, valid_o = oracle.db_and_mask(x)
    want16 = oracle.autoscale_db_image(db_o, valid_o, bit_depth.max_val)

    db, mask, st = pipeline.compute_db_and_stats(x)
    got16 = pipeline.autoscale_db_image(db, mask, st, bit_depth)
    _assert_quantized_close(got16, want16, bit_depth.max_val)


@pytest.mark.parametrize(
    "strategy",
    [AutoscaleStrategy.ROBUST, AutoscaleStrategy.ADAPTIVE,
     AutoscaleStrategy.EQUALIZED, AutoscaleStrategy.TAMED,
     AutoscaleStrategy.DEFAULT],
)
def test_advanced_autoscale(rng, strategy):
    x = sar_like(rng)
    db_o, valid_o = oracle.db_and_mask(x)
    want16 = oracle.autoscale_db_image_advanced(db_o, valid_o, 65535.0, strategy.value)

    db, mask, st = pipeline.compute_db_and_stats(x)
    got16 = pipeline.autoscale_db_image_advanced(db, mask, st, BitDepth.U16, strategy)
    _assert_quantized_close(got16, want16, 65535.0)


def test_u8_double_normalization_quirk(rng):
    """U8 outputs go through the second min-max rescale
    (reference: autoscale.rs:348-364, :662-704)."""
    q = rng.integers(3, 200, size=(32, 32)).astype(np.uint16)
    want = oracle.scale_u16_to_u8(q)
    got = np.asarray(pipeline.scale_u16_to_u8(q))
    np.testing.assert_array_equal(got, want)


def test_scale_u16_constant_input():
    q = np.full((4, 4), 7, np.uint16)
    got = np.asarray(pipeline.scale_u16_to_u8(q))
    # max == min -> scale 1.0 -> (x - min) * 1 = 0
    np.testing.assert_array_equal(got, np.zeros((4, 4), np.uint8))


@pytest.mark.parametrize("is_copol", [True, False])
def test_tamed_synrgb_band_autoscale(rng, is_copol):
    x = sar_like(rng)
    db_o, valid_o = oracle.db_and_mask(x)
    want = oracle.tamed_synrgb_u8(db_o, valid_o, is_copol)
    db, mask, st = pipeline.compute_db_and_stats(x)
    got = pipeline.autoscale_db_image_tamed_synrgb_u8(db, mask, st, is_copol)
    _assert_quantized_close(got, want, 255.0, hard_abs=8)


def test_pipeline_zero_valid():
    x = np.zeros((16, 16), np.float32)
    res = pipeline.process_scalar_data_pipeline(x, BitDepth.U16, AutoscaleStrategy.STANDARD)
    assert np.all(np.asarray(res.scaled_u16) == 0)


def test_full_pipeline_dispatch(rng):
    x = sar_like(rng, (48, 40))
    res8 = pipeline.process_scalar_data_pipeline(x, BitDepth.U8, AutoscaleStrategy.ROBUST)
    assert res8.scaled_u8 is not None and res8.scaled_u16 is None
    assert np.asarray(res8.scaled_u8).dtype == np.uint8
    res16 = pipeline.process_scalar_data_pipeline(x, BitDepth.U16, AutoscaleStrategy.STANDARD)
    assert res16.scaled_u16 is not None and res16.scaled_u8 is None
    assert np.asarray(res16.scaled_u16).dtype == np.uint16
