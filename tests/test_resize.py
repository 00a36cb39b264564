"""Tests: resize dimension math, padding, Lanczos3 convolution vs Pillow."""
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

import oracle
from sarpro_tpu.core import resize
from sarpro_tpu.types import BitDepth


def test_calculate_resize_dimensions():
    # landscape / portrait / upscale-noop (reference: resize.rs:6-30)
    assert resize.calculate_resize_dimensions(4000, 2000, 1000) == (1000, 500)
    assert resize.calculate_resize_dimensions(2000, 4000, 1000) == (500, 1000)
    assert resize.calculate_resize_dimensions(800, 600, 1000) == (800, 600)
    assert resize.calculate_resize_dimensions(3000, 2000, 1024) == (1024, 683)


def test_padding_matches_oracle(rng):
    arr = rng.integers(0, 255, (30, 50)).astype(np.uint8)
    p8, _ = resize.add_padding_to_square(arr, None, 50, 30, BitDepth.U8)
    np.testing.assert_array_equal(np.asarray(p8), oracle.pad_to_square(arr))

    arr16 = rng.integers(0, 65535, (50, 30)).astype(np.uint16)
    _, p16 = resize.add_padding_to_square(None, arr16, 30, 50, BitDepth.U16)
    np.testing.assert_array_equal(np.asarray(p16), oracle.pad_to_square(arr16))


@pytest.mark.parametrize("shape,target", [((128, 96), (64, 48)), ((100, 80), (37, 30))])
def test_lanczos3_u8_vs_pillow(rng, shape, target):
    """Pillow LANCZOS uses the same convolution bounds/normalization that
    fast_image_resize ports — outputs should agree within fixed-point noise."""
    img = rng.integers(0, 256, shape).astype(np.uint8)
    got = np.asarray(
        resize.resize_u8_image(img, shape[1], shape[0], target[1], target[0])
    )
    want = np.asarray(
        Image.fromarray(img).resize((target[1], target[0]), Image.LANCZOS)
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff == 0).mean() > 0.95


def test_lanczos3_u16(rng):
    """u16 path: two passes through a u16 intermediate (matching
    fast_image_resize's U16 pipeline). Compare against the single-pass float
    reference within per-pass rounding."""
    img = rng.integers(0, 65536, (64, 64)).astype(np.uint16)
    got = np.asarray(resize.resize_u16_image(img, 64, 64, 32, 32))
    # f64 oracle of the same two-pass pipeline (horizontal, clamp to u16,
    # vertical, clamp) — the clamps matter: Lanczos ringing clipped per pass
    s, w = (np.asarray(a) for a in resize._build_coeffs(64, 32, "lanczos3"))

    def conv0(x):
        idx = np.clip(s[:, None] + np.arange(w.shape[1]), 0, x.shape[0] - 1)
        return np.einsum("ok,okc->oc", w.astype(np.float64), x[idx])

    mid = np.clip(np.floor(conv0(img.astype(np.float64).T).T + 0.5), 0, 65535)
    want = np.clip(np.floor(conv0(mid) + 0.5), 0, 65535).astype(np.uint16)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 2  # f32-vs-f64 rounding, one step per pass
    assert (diff <= 1).mean() > 0.99


def test_identity_resample(rng):
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    got = np.asarray(resize.resize_u8_image(img, 32, 32, 32, 32))
    np.testing.assert_array_equal(got, img)


def test_resize_image_data_with_meta_skip_and_pad(rng):
    img = rng.integers(0, 255, (40, 60)).astype(np.uint8)
    # already at target long side -> skip resize, pad to square
    (fc, fr, u8, u16, sx, sy, pl, pt) = resize.resize_image_data_with_meta(
        img, None, 60, 40, 60, BitDepth.U8, pad=True
    )
    assert (fc, fr) == (60, 60) and (sx, sy) == (1.0, 1.0)
    assert (pl, pt) == (0, 10)
    np.testing.assert_array_equal(np.asarray(u8), oracle.pad_to_square(img))

    # actual resize with meta
    (fc, fr, u8, u16, sx, sy, pl, pt) = resize.resize_image_data_with_meta(
        img, None, 60, 40, 30, BitDepth.U8, pad=False
    )
    assert (fc, fr) == (30, 20)
    assert sx == pytest.approx(0.5) and sy == pytest.approx(0.5)
    assert (pl, pt) == (0, 0)


def test_resample_filters_smoke(rng):
    """All reader-path filters produce sane output (downsample-on-read,
    reference: gdal.rs:145-177 + sentinel1.rs:1089-1102)."""
    x = rng.lognormal(5, 1, (100, 80)).astype(np.float32)
    for f in ("nearest", "bilinear", "cubic", "lanczos", "average"):
        y = np.asarray(resize.resample_plane(x, 25, 20, f))
        assert y.shape == (25, 20)
        assert np.isfinite(y).all()
        # means should be preserved approximately by averaging filters
        if f in ("average", "bilinear"):
            assert abs(y.mean() - x.mean()) / x.mean() < 0.05


def test_band_plan_covers_all_taps_unaligned_input():
    """Code-review regression: with in_size % 16 != 0, the banded resampler's
    end-clamp could shift the DMA band start below the +16 slack and taps
    fell off the band silently (weight loss on the bottom/right edges). The
    plan must either place EVERY nonzero tap inside the band or refuse."""
    from sarpro_tpu.core.resize import _build_coeffs
    from sarpro_tpu.ops.resample_kernel import _band_plan

    for in_size, out_n, filt in ((16705, 2048, "average"), (1000, 100, "average"),
                                 (16695, 2048, "lanczos"), (977, 97, "average")):
        plan = _band_plan(in_size, out_n, filt)
        if plan is None:
            continue  # refusing is always safe
        r0s, W, B, G, kb = plan
        # kernel-covered blocks must carry every nonzero tap; blocks past
        # kb are computed by the tap-loop instead
        assert kb >= 1
        starts, weights = _build_coeffs(in_size, out_n, filt)
        for o in range(min(kb * 8, out_n)):
            placed = W[o // 8, o % 8].sum()
            expect = weights[o].sum()
            assert placed == pytest.approx(expect, abs=1e-6), \
                f"row {o} of {in_size}->{out_n} {filt}: {placed} != {expect}"
        for i in range(kb):
            assert r0s[i] + B <= in_size  # DMA stays inside the source


def test_band_plan_weight_totals_aligned():
    from sarpro_tpu.core.resize import _build_coeffs
    from sarpro_tpu.ops.resample_kernel import _band_plan

    plan = _band_plan(20000, 2048, "average")
    assert plan is not None
    r0s, W, B, G, kb = plan
    # the final block's band (start slack) may poke past the source end and
    # fall to the tap-loop; everything else must ride the kernel
    assert kb >= G - 1
    starts, weights = _build_coeffs(20000, 2048, "average")
    np.testing.assert_allclose(
        W.reshape(G * 8, B)[:kb * 8].sum(axis=1),
        weights.sum(axis=1)[:kb * 8], atol=1e-6)


def test_banded_kernel_declines_narrow_extreme_reduction():
    """A 128-lane raster with an extreme reduction cannot shrink its column
    chunk below one lane group; the banded kernel must decline (tap-loop
    fallback) instead of blowing the VMEM scratch at compile time."""
    from sarpro_tpu.ops import resample_kernel as rk

    in_size, out_size = 40000, 10
    x = jnp.zeros((in_size, 128), jnp.float32)
    plan = rk._band_plan(in_size, out_size, "lanczos")
    if plan is None:
        pytest.skip("planner already declines this shape")
    _, _, B, _, _ = plan
    res = rk.band_resample_axis0(x, in_size, out_size, "lanczos")
    if 2 * B * 128 * 4 > rk._MAX_SCRATCH_BYTES:
        assert res is None
