"""Interpret-mode coverage of the ACTUAL Pallas kernel bodies, off-silicon.

The rest of the suite exercises the XLA fallbacks on CPU; the kernel bodies
themselves (one-hot builds, tile-row banding windows, SMEM scalar streams,
DMA'd source windows) previously ran only on real TPU hardware (validated by
benchmarks/tpu_validate.py). `ops.kernels.pallas_interpret` routes every
pallas_call through the Pallas TPU interpreter on the current backend, so a
kernel LOGIC bug (a wrong band anchor, an off-by-one in a dynamic slice, a
mis-specced BlockSpec) is caught here without a TPU. Numerical caveat: the
interpreter executes the same op sequence with the same dtypes (bf16
operands, f32 accumulation), but the accumulation ORDER of a CPU dot may
differ from the MXU's — integer one-hot contractions are still exact;
CDF-valued lookups are compared at the documented bf16-split tolerance.

Shapes are chosen small but STRUCTURAL: both the banded and unbanded
tile-window paths run, blocks straddle row boundaries, masked pixels and
partial edge tiles are present, and the warp/resample kernels drive their
double-buffered DMA pipelines over multi-block grids.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sarpro_tpu.ops import kernels as K
from sarpro_tpu.ops import resample_kernel as RK
from sarpro_tpu.ops import warp_kernel as WK


def test_interpret_mode_flag_plumbs():
    assert not K.use_pallas()  # CPU backend outside the context
    with K.pallas_interpret():
        assert K.use_pallas()
        assert K.interpret_mode()
        # force_xla_fallbacks still wins inside (the sharded paths rely
        # on it routing AROUND the kernels regardless of mode)
        with K.force_xla_fallbacks():
            assert not K.use_pallas()
    assert not K.interpret_mode()


def test_histogram_kernel_interpret_exact(rng):
    n = 70_000  # > 4 blocks of _HIST_K, with a padded tail
    bins = rng.integers(0, 4096, n).astype(np.int32)
    mask = rng.random(n) < 0.9
    idx = jnp.asarray(np.where(mask, bins, 4096))
    want = np.asarray(K._histogram_xla(idx, 4096))
    with K.pallas_interpret():
        got = np.asarray(K.histogram(idx, 4096))
    np.testing.assert_array_equal(got, want)


def test_histogram_kernel_interpret_256_bins(rng):
    idx = jnp.asarray(rng.integers(0, 256, 20_000).astype(np.int32))
    want = np.asarray(K._histogram_xla(idx, 256))
    with K.pallas_interpret():
        got = np.asarray(K.histogram(idx, 256))
    np.testing.assert_array_equal(got, want)


def test_tile_histogram_kernel_interpret_banded(rng):
    # cols=512 -> one 8192-block spans 17 rows <= tile_h: the banded
    # accumulate path (band_ty=2, dynamic out-row slice) engages
    rows, cols = 144, 512
    tile_h, tile_w = 18, 64
    bins = rng.integers(0, 257, rows * cols).astype(np.int32)  # 256 = masked
    b = jnp.asarray(bins)
    want = np.asarray(K._tile_histogram_xla(b, cols, 8, 8, tile_h, tile_w,
                                            256))
    with K.pallas_interpret():
        got = np.asarray(K.tile_histogram(b, cols, 8, 8, tile_h, tile_w))
    np.testing.assert_array_equal(got, want)
    assert got.sum() == int((bins < 256).sum())


def test_tile_histogram_kernel_interpret_unbanded_offset(rng):
    # tiles_x=4 (not a multiple of 8) disables banding -> full-table path;
    # row_offset exercises the chunk/shard coordinate shift
    rows, cols = 64, 96
    tile_h, tile_w = 32, 24
    bins = rng.integers(0, 257, rows * cols).astype(np.int32)
    b = jnp.asarray(bins)
    off = jnp.int32(64)
    want = np.asarray(K._tile_histogram_xla(b, cols, 4, 4, tile_h, tile_w,
                                            256, row_offset=off))
    with K.pallas_interpret():
        got = np.asarray(K.tile_histogram(b, cols, 4, 4, tile_h, tile_w,
                                          row_offset=off))
    np.testing.assert_array_equal(got, want)


def test_clahe_lookup_kernel_interpret_banded(rng):
    rows, cols = 160, 512
    tile_h, tile_w = 20, 64
    n = rows * cols
    bins = rng.integers(0, 256, n).astype(np.int32)
    mask = rng.random(n) < 0.95
    bin_idx = jnp.asarray(np.where(mask, bins, 256))
    cdfs = jnp.asarray(rng.random((64, 256)).astype(np.float32))
    want = np.asarray(K._clahe_lookup_xla(bin_idx, cdfs, cols, 8, 8,
                                          tile_h, tile_w))
    with K.pallas_interpret():
        got = np.asarray(K.clahe_lookup(bin_idx, cdfs, cols, 8, 8,
                                        tile_h, tile_w))
    # bf16 hi/lo split reconstructs the f32 CDFs to ~1e-5 (documented
    # kernel tolerance); masked pixels are exactly zero
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert np.all(got[~mask] == 0.0)


def test_clahe_lookup_kernel_interpret_unbanded_offset(rng):
    rows, cols = 48, 80  # tiles_x=8 but a block spans > tile_h-2 rows
    tile_h, tile_w = 6, 10
    n = rows * cols
    bin_idx = jnp.asarray(rng.integers(0, 256, n).astype(np.int32))
    cdfs = jnp.asarray(rng.random((64, 256)).astype(np.float32))
    off = jnp.int32(24)
    want = np.asarray(K._clahe_lookup_xla(bin_idx, cdfs, cols, 8, 8,
                                          tile_h * 2, tile_w,
                                          row_offset=off))
    with K.pallas_interpret():
        got = np.asarray(K.clahe_lookup(bin_idx, cdfs, cols, 8, 8,
                                        tile_h * 2, tile_w, row_offset=off))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_synrgb_lookup_kernel_interpret_exact(rng):
    n = 20_000
    b1 = jnp.asarray(rng.integers(0, 256, n).astype(np.uint8))
    b2 = jnp.asarray(rng.integers(0, 256, n).astype(np.uint8))
    lut_r = jnp.asarray(rng.integers(0, 256, 256).astype(np.uint8))
    lut_g = jnp.asarray(rng.integers(0, 256, 256).astype(np.uint8))
    lut_b = jnp.asarray(rng.integers(0, 256, 256 * 256).astype(np.uint8))
    want = np.asarray(K._synrgb_lookup_xla(b1, b2, lut_r, lut_g, lut_b))
    with K.pallas_interpret():
        got = np.asarray(K.synrgb_lookup(b1, b2, lut_r, lut_g, lut_b))
    # u8 tables are exact in bf16: the kernel is bit-exact by design
    np.testing.assert_array_equal(got, want)


def test_synrgb_formula_kernel_interpret_exhaustive():
    """The formula kernel's bit-exactness contract (correction list et al.)
    over the FULL 256x256 (b1, b2) domain, vs the table lowering — the same
    check benchmarks/tpu_validate.py stamps on silicon."""
    from sarpro_tpu.core.synthetic_rgb import (default_formula_tables,
                                               default_luts)

    tabs = default_formula_tables()
    assert tabs is not None
    g1, g2 = np.meshgrid(np.arange(256, dtype=np.uint8),
                         np.arange(256, dtype=np.uint8), indexing="ij")
    b1 = jnp.asarray(g1.ravel())
    b2 = jnp.asarray(g2.ravel())
    lut_r, lut_g, lut_b = default_luts()
    want = np.asarray(K._synrgb_lookup_xla(
        b1, b2, jnp.asarray(lut_r), jnp.asarray(lut_g),
        jnp.asarray(lut_b.ravel())))
    with K.pallas_interpret():
        got = np.asarray(K.synrgb_lookup_formula(b1, b2, *[
            jnp.asarray(t) for t in tabs], guard_b2=True))
    np.testing.assert_array_equal(got, want)


def test_warp_tiled_kernel_interpret(rng):
    """Tiled Pallas warp (DMA'd source windows, SMEM coefficient streams)
    vs the XLA sampler on a small rotated mapping."""
    from sarpro_tpu.io import warp as W

    side, out_r, out_c = 420, 256, 256
    gh = gw = 17
    yy, xx = np.meshgrid(np.linspace(0, 1, gh), np.linspace(0, 1, gw),
                         indexing="ij")
    map_x = (xx * 0.9 + 0.02 * yy) * (side - 8) + 3.0
    map_y = (yy * 0.9 + 0.02 * xx) * (side - 8) + 2.0
    src = jnp.asarray(rng.normal(size=(side, side)).astype(np.float32))
    ref = np.asarray(W._warp_sample(
        src, jnp.asarray(map_x, jnp.float32), jnp.asarray(map_y, jnp.float32),
        out_r, out_c, "bilinear"))
    with K.pallas_interpret():
        got = WK.warp_sample_tiled(src, map_x, map_y, out_r, out_c,
                                   "bilinear")
        assert got is not None
        got = np.asarray(got)
    assert got.shape == ref.shape
    # same taps, different evaluation order (tile-local coefficient fits
    # vs global): matches the documented on-TPU parity bound
    assert np.abs(got - ref).mean() < 1e-3


def test_resample_banded_kernel_interpret(rng):
    """Banded-DMA axis-0 resampler vs the tap-loop reference path."""
    from sarpro_tpu.core import resize as R

    in_size, out_size, cols = 512, 128, 256
    x = jnp.asarray(rng.integers(0, 65535, (in_size, cols))
                    .astype(np.uint16))
    # reference: the coefficient tap-loop (same coefficients, tap order)
    s, w = R._build_coeffs(in_size, out_size, "lanczos3")
    want = np.asarray(R._resample_axis0(x, jnp.asarray(s), jnp.asarray(w)))
    with K.pallas_interpret():
        got = RK.band_resample_axis0(x, in_size, out_size, "lanczos3")
        assert got is not None
        got = np.asarray(got)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-2)
