"""Tests for ops/kernels.py.

On CPU these exercise the XLA fallbacks (used by the rest of the suite); the
Pallas paths require a TPU and auto-skip elsewhere — their parity was
validated on v5e (histogram exact, CLAHE lookup to 4e-7, synRGB exact).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sarpro_tpu.ops import kernels as K


def test_histogram_fallback_masks_overflow(rng):
    n = 10_000
    bins = rng.integers(0, 4096, n).astype(np.int32)
    mask = rng.random(n) < 0.9
    idx = np.where(mask, bins, 4096)
    got = np.asarray(K.histogram(jnp.asarray(idx), 4096))
    want = np.bincount(bins[mask], minlength=4096)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == mask.sum()


def test_clahe_lookup_fallback_matches_direct(rng):
    rows, cols = 96, 80
    n = rows * cols
    bins = rng.integers(0, 256, n).astype(np.int32)
    mask = rng.random(n) < 0.95
    bin_idx = np.where(mask, bins, 256)
    cdfs = rng.random((64, 256)).astype(np.float32)
    tile_h, tile_w = 12, 10
    got = np.asarray(K.clahe_lookup(
        jnp.asarray(bin_idx), jnp.asarray(cdfs), cols, 8, 8, tile_h, tile_w
    ))
    # direct per-pixel oracle
    want = np.zeros(n)
    for p in range(n):
        if not mask[p]:
            continue
        r, c = divmod(p, cols)
        rf = np.float32(r) / np.float32(tile_h) - 0.5
        cf = np.float32(c) / np.float32(tile_w) - 0.5
        ty = int(max(np.floor(rf), 0))
        tx = int(max(np.floor(cf), 0))
        dy = rf - ty
        dx = cf - tx
        ty0, tx0 = min(ty, 7), min(tx, 7)
        ty1, tx1 = min(ty + 1, 7), min(tx + 1, 7)
        b = bins[p]
        c00 = cdfs[ty0 * 8 + tx0, b]
        c01 = cdfs[ty0 * 8 + tx1, b]
        c10 = cdfs[ty1 * 8 + tx0, b]
        c11 = cdfs[ty1 * 8 + tx1, b]
        want[p] = ((c00 * (1 - dx) + c01 * dx) * (1 - dy)
                   + (c10 * (1 - dx) + c11 * dx) * dy)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(got[~mask] == 0.0)


def test_synrgb_lookup_fallback(rng):
    n = 5000
    b1 = rng.integers(0, 256, n).astype(np.uint8)
    b2 = rng.integers(0, 256, n).astype(np.uint8)
    lut_r = rng.integers(0, 256, 256).astype(np.uint8)
    lut_g = rng.integers(0, 256, 256).astype(np.uint8)
    lut_b = rng.integers(0, 256, 256 * 256).astype(np.uint8)
    got = np.asarray(K.synrgb_lookup(
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(lut_r),
        jnp.asarray(lut_g), jnp.asarray(lut_b)
    ))
    np.testing.assert_array_equal(got[:, 0], lut_r[b1])
    np.testing.assert_array_equal(got[:, 1], lut_g[b2])
    np.testing.assert_array_equal(
        got[:, 2], lut_b[b1.astype(np.int64) * 256 + b2]
    )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_pallas_parity_on_tpu(rng):
    n = 1 << 20
    bins = jnp.asarray(rng.integers(0, 4096, n).astype(np.int32))
    got = np.asarray(K._histogram_pallas(bins, 4096))
    want = np.asarray(K._histogram_xla(bins, 4096))
    np.testing.assert_array_equal(got, want)


def test_tile_histogram_fallback_matches_numpy(rng):
    """tile_histogram vs a direct numpy per-tile bincount, incl. masked
    pixels, partial bottom/right tiles, and the row_offset chunk path."""
    rows, cols, tiles = 37, 53, 8
    tile_h = -(-rows // tiles)
    tile_w = -(-cols // tiles)
    bins = rng.integers(0, 257, rows * cols).astype(np.int32)  # 256 = masked

    def oracle(b, row_off=0):
        hist = np.zeros((tiles * tiles, 256), np.int64)
        for i, v in enumerate(b):
            if v >= 256:
                continue
            r, c = divmod(i, cols)
            ty = min((r + row_off) // tile_h, tiles - 1)
            tx = min(c // tile_w, tiles - 1)
            hist[ty * tiles + tx, v] += 1
        return hist.reshape(-1)

    got = np.asarray(K.tile_histogram(jnp.asarray(bins), cols, tiles, tiles,
                                      tile_h, tile_w))
    np.testing.assert_array_equal(got, oracle(bins))
    # chunked/sharded offset: rows 16.. of a taller global raster
    got = np.asarray(K.tile_histogram(jnp.asarray(bins), cols, tiles, tiles,
                                      tile_h * 2, tile_w, row_offset=16))
    hist = np.zeros((tiles * tiles, 256), np.int64)
    for i, v in enumerate(bins):
        if v >= 256:
            continue
        r, c = divmod(i, cols)
        ty = min((r + 16) // (tile_h * 2), tiles - 1)
        tx = min(c // tile_w, tiles - 1)
        hist[ty * tiles + tx, v] += 1
    np.testing.assert_array_equal(got, hist.reshape(-1))
    # total count conservation: every unmasked pixel lands in exactly one cell
    assert got.sum() == int((bins < 256).sum())
