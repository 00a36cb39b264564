"""One-hot MXU kernels: histograms and small-table lookups (see __init__).

Layout note: element streams enter as (K, 1) columns — the lane dimension is
padded in VMEM but HBM traffic stays 4 B/element, and the column shape lets
one-hot construction be a lane-broadcast compare against an iota, feeding a
plain 2D (K, M)ᵀ(K, N) MXU contraction (Mosaic supports neither multiple
contracting dims nor batched matmuls here).

Every kernel has an XLA fallback (scatter / take) used off-TPU; fallback and
kernel agree exactly for integer tables and to f32 rounding for CDFs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# GSPMD cannot partition Pallas custom calls: sharded multi-chip pipelines
# (parallel/sharded.py) force the XLA fallbacks so histogram reductions turn
# into per-shard partials + psum. Single-chip paths keep the kernels.
_FORCE_XLA = False


class force_xla_fallbacks:
    """Context manager: route kernel dispatch to the XLA fallbacks."""

    def __enter__(self):
        global _FORCE_XLA
        self._prev = _FORCE_XLA
        _FORCE_XLA = True
        return self

    def __exit__(self, *exc):
        global _FORCE_XLA
        _FORCE_XLA = self._prev
        return False


def use_pallas() -> bool:
    return not _FORCE_XLA and jax.default_backend() == "tpu"


def _pad_flat(x, k: int, fill):
    n = x.size
    g = -(-n // k)
    pad = g * k - n
    flat = x.reshape(-1)
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad,), fill, x.dtype)])
    return flat.reshape(-1, 1), g


# ---------------------------------------------------------------------------
# Histogram
# ---------------------------------------------------------------------------
_HIST_K = 8192


def _hist_kernel(h: int, idx_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    col = idx_ref[:]  # (K, 1) i32; masked elements carry an overflow index
    hi = (col // LANE) == jax.lax.broadcasted_iota(jnp.int32, (_HIST_K, h), 1)
    lo = (col % LANE) == jax.lax.broadcasted_iota(jnp.int32, (_HIST_K, LANE), 1)
    part = jax.lax.dot_general(
        hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out_ref[:] += part.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_bins",))
def _histogram_pallas(idx, num_bins: int):
    # one extra hi-band absorbs masked elements (idx == num_bins.. )
    h = num_bins // LANE + 1
    idx2, g = _pad_flat(idx.astype(jnp.int32), _HIST_K, num_bins)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, h),
        grid=(g,),
        in_specs=[pl.BlockSpec((_HIST_K, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, LANE), jnp.int32),
    )(idx2)
    return out.reshape(-1)[:num_bins]


@functools.partial(jax.jit, static_argnames=("num_bins",))
def _histogram_xla(idx, num_bins: int):
    idx = idx.reshape(-1)
    valid = idx < num_bins
    safe = jnp.where(valid, idx, 0)
    return jnp.zeros((num_bins,), jnp.int32).at[safe].add(valid.astype(jnp.int32))


# The Mosaic compiler crashes on large grids/operands (empirically: the
# lookup kernels fail above ~2048 grid steps, the histogram somewhat later);
# chunk kernel invocations below these and combine in XLA.
_MAX_ELEMS = 16 << 20          # histogram (K=8192 -> 2048 steps)
_MAX_LOOKUP_ELEMS = 4 << 20    # lookups (K=4096 -> 1024 steps; the synRGB
                               # kernel crashes the compiler at 2048 steps)


def histogram(idx, num_bins: int):
    """Counts of idx values in [0, num_bins); entries >= num_bins (the mask
    convention) are ignored. num_bins must be a multiple of 128."""
    assert num_bins % LANE == 0, num_bins
    if not use_pallas():
        return _histogram_xla(idx, num_bins)
    flat = idx.reshape(-1)
    n = flat.size
    if n <= _MAX_ELEMS:
        return _histogram_pallas(flat, num_bins)
    out = None
    for start in range(0, n, _MAX_ELEMS):
        part = _histogram_pallas(flat[start:start + _MAX_ELEMS], num_bins)
        out = part if out is None else out + part
    return out


# ---------------------------------------------------------------------------
# CLAHE bilinear CDF lookup
# ---------------------------------------------------------------------------
_CLAHE_K = 4096  # VMEM-bound: bf16 one-hot (K,256) + (K,1) lane-padded cols


def _clahe_kernel(tiles_x: int, tiles_y: int, tile_h: int, tile_w: int,
                  n_bins: int, cols: int, base_ref, off_ref, bin_ref,
                  cdhi_ref, cdlo_ref, out_ref):
    k = _CLAHE_K
    i = pl.program_id(0)
    # recover (r, c) from the flat pixel index — saves two lane-padded
    # inputs. The global block index streams through SMEM so chunked
    # invocations (huge rasters) share one compiled kernel. `off_ref` carries
    # a global row offset so row-sharded shards (shard_map) interpolate with
    # their true raster coordinates.
    gb = base_ref[i % 8, 0]
    flat = gb * k + jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    r = flat // cols + off_ref[0, 0]
    c = flat % cols
    rf = r.astype(jnp.float32) / np.float32(tile_h) - 0.5  # (K,1)
    cf = c.astype(jnp.float32) / np.float32(tile_w) - 0.5
    tyf = jnp.maximum(jnp.floor(rf), 0.0)
    txf = jnp.maximum(jnp.floor(cf), 0.0)
    dy = rf - tyf
    dx = cf - txf
    tyi = tyf.astype(jnp.int32)
    txi = txf.astype(jnp.int32)
    ty0 = jnp.clip(tyi, 0, tiles_y - 1)
    tx0 = jnp.clip(txi, 0, tiles_x - 1)
    ty1 = jnp.clip(tyi + 1, 0, tiles_y - 1)
    tx1 = jnp.clip(txi + 1, 0, tiles_x - 1)

    n_tiles = tiles_x * tiles_y
    tids = jax.lax.broadcasted_iota(jnp.int32, (k, n_tiles), 1)
    w00 = (1.0 - dx) * (1.0 - dy)
    w01 = dx * (1.0 - dy)
    w10 = (1.0 - dx) * dy
    w11 = dx * dy
    # bilinear weights folded into a (K, n_tiles) matrix — rows have <=4
    # nonzeros; corners falling on the same tile accumulate, matching the
    # reference's formula exactly.
    wmat = (
        jnp.where(tids == ty0 * tiles_x + tx0, w00, 0.0)
        + jnp.where(tids == ty0 * tiles_x + tx1, w01, 0.0)
        + jnp.where(tids == ty1 * tiles_x + tx0, w10, 0.0)
        + jnp.where(tids == ty1 * tiles_x + tx1, w11, 0.0)
    )
    # select-bin-first: per-pixel CDF value of EVERY tile at own bin.
    # The CDF table arrives hi/lo-split into two bf16 planes (the one-hot is
    # exact in bf16, so selection reconstructs the f32 CDF to ~1e-5).
    bins = bin_ref[:]  # (K,1), invalid pixels carry n_bins (all-zero onehot)
    onehot_bin = (
        bins == jax.lax.broadcasted_iota(jnp.int32, (k, n_bins), 1)
    ).astype(jnp.bfloat16)
    pt = jax.lax.dot_general(  # (K, n_tiles)
        onehot_bin, cdhi_ref[:],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    pt = pt + jax.lax.dot_general(
        onehot_bin, cdlo_ref[:],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out_ref[:] = jnp.sum(wmat * pt, axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("cols", "tiles_x", "tiles_y", "tile_h", "tile_w",
                     "block_base"))
def _clahe_lookup_pallas_chunk(bin_idx, cdhi, cdlo, cols, tiles_x, tiles_y,
                               tile_h, tile_w, block_base: int,
                               row_offset=None):
    n = bin_idx.size
    n_tiles, n_bins = cdhi.shape
    b2, g = _pad_flat(bin_idx.astype(jnp.int32), _CLAHE_K, n_bins)
    base = (jnp.arange(-(-g // 8) * 8, dtype=jnp.int32) + block_base
            ).reshape(-1, 1)
    off = jnp.full((1, 1), 0, jnp.int32) if row_offset is None else \
        jnp.asarray(row_offset, jnp.int32).reshape(1, 1)
    kern = functools.partial(_clahe_kernel, tiles_x, tiles_y, tile_h, tile_w,
                             n_bins, cols)
    out = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_CLAHE_K, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, n_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, n_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CLAHE_K, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g * _CLAHE_K, 1), jnp.float32),
    )(base, off, b2, cdhi, cdlo)
    return out.reshape(-1)[:n]


def _clahe_lookup_pallas(bin_idx, cdfs, cols, tiles_x, tiles_y, tile_h,
                         tile_w, row_offset=None):
    # hi/lo bf16 split of the f32 CDFs; the barrier stops XLA from folding
    # convert(convert(x)) back to x, which would zero the lo plane
    cdfs = jnp.asarray(cdfs, jnp.float32)
    cdhi = jax.lax.optimization_barrier(cdfs.astype(jnp.bfloat16))
    cdlo = (cdfs - cdhi.astype(jnp.float32)).astype(jnp.bfloat16)
    flat = bin_idx.reshape(-1)
    n = flat.size
    if n <= _MAX_LOOKUP_ELEMS:
        return _clahe_lookup_pallas_chunk(flat, cdhi, cdlo, cols, tiles_x,
                                          tiles_y, tile_h, tile_w, 0,
                                          row_offset)
    assert _MAX_LOOKUP_ELEMS % _CLAHE_K == 0
    parts = []
    for start in range(0, n, _MAX_LOOKUP_ELEMS):
        parts.append(_clahe_lookup_pallas_chunk(
            flat[start:start + _MAX_LOOKUP_ELEMS], cdhi, cdlo, cols, tiles_x,
            tiles_y, tile_h, tile_w, start // _CLAHE_K, row_offset,
        ))
    return jnp.concatenate(parts)


@functools.partial(
    jax.jit,
    static_argnames=("cols", "tiles_x", "tiles_y", "tile_h", "tile_w"))
def _clahe_lookup_xla(bin_idx, cdfs, cols, tiles_x, tiles_y, tile_h, tile_w,
                      row_offset=None):
    flat = jnp.arange(bin_idx.size, dtype=jnp.int32)
    r = flat // cols
    if row_offset is not None:
        r = r + jnp.asarray(row_offset, jnp.int32)
    c = flat % cols
    rf = r.astype(jnp.float32) / np.float32(tile_h) - 0.5
    cf = c.astype(jnp.float32) / np.float32(tile_w) - 0.5
    tyf = jnp.maximum(jnp.floor(rf), 0.0)
    txf = jnp.maximum(jnp.floor(cf), 0.0)
    dy = rf - tyf
    dx = cf - txf
    tyi = tyf.astype(jnp.int32)
    txi = txf.astype(jnp.int32)
    ty0 = jnp.clip(tyi, 0, tiles_y - 1)
    tx0 = jnp.clip(txi, 0, tiles_x - 1)
    ty1 = jnp.clip(tyi + 1, 0, tiles_y - 1)
    tx1 = jnp.clip(txi + 1, 0, tiles_x - 1)
    n_tiles, n_bins = cdfs.shape
    flat = cdfs.ravel()
    safe_bin = jnp.minimum(bin_idx, n_bins - 1)
    valid = bin_idx < n_bins

    def at(a, b):
        return jnp.take(flat, (a * tiles_x + b) * n_bins + safe_bin)

    top = at(ty0, tx0) * (1 - dx) + at(ty0, tx1) * dx
    bot = at(ty1, tx0) * (1 - dx) + at(ty1, tx1) * dx
    return jnp.where(valid, top * (1 - dy) + bot * dy, 0.0)


def clahe_lookup(bin_idx, cdfs, cols, tiles_x, tiles_y, tile_h, tile_w,
                 row_offset=None):
    """Bilinear interpolation between the 4 neighbor-tile CDFs at each
    pixel's bin (reference: autoscale.rs:307-343). `bin_idx` is the flat
    row-major (N,) bin array for a (N/cols, cols) image; `bin_idx == n_bins`
    marks invalid pixels -> 0. `row_offset` (traced scalar) shifts pixel rows
    to global raster coordinates for row-sharded shards. Returns (N,) f32."""
    if use_pallas():
        return _clahe_lookup_pallas(bin_idx, cdfs, cols,
                                    tiles_x, tiles_y, tile_h, tile_w,
                                    row_offset)
    return _clahe_lookup_xla(bin_idx, cdfs, cols,
                             tiles_x, tiles_y, tile_h, tile_w, row_offset)


# ---------------------------------------------------------------------------
# synRGB LUT lookup (1D r/g tables + 2D blue table)
# ---------------------------------------------------------------------------
_SYNRGB_K = 4096


def _synrgb_kernel(packed_ref, lutr_ref, lutg_ref, lutb_ref, out_ref):
    """r/g via masked one-hot reductions; blue = row-select of the 2D table
    on the MXU then column-select. u8 tables are exact in bf16 (integers
    <= 255), so the bf16 MXU pass is bit-exact. Both bands arrive packed as
    b1*256 + b2 in one lane-padded column (halves the input VMEM)."""
    k = _SYNRGB_K
    packed = packed_ref[:]
    oh1 = ((packed // 256) == jax.lax.broadcasted_iota(jnp.int32, (k, 256), 1))
    oh2 = ((packed % 256) == jax.lax.broadcasted_iota(jnp.int32, (k, 256), 1))
    oh1f = oh1.astype(jnp.float32)
    oh2f = oh2.astype(jnp.float32)
    r = jnp.sum(oh1f * lutr_ref[:], axis=1, keepdims=True)
    g = jnp.sum(oh2f * lutg_ref[:], axis=1, keepdims=True)
    rows = jax.lax.dot_general(  # (K, 256): per-pixel blue row for own b1
        oh1.astype(jnp.bfloat16), lutb_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    blue = jnp.sum(rows * oh2f, axis=1, keepdims=True)
    out_ref[:, 0:1] = r
    out_ref[:, 1:2] = g
    out_ref[:, 2:3] = blue


@jax.jit
def _synrgb_lookup_pallas(b1, b2, lut_r, lut_g, lut_b):
    n = b1.size
    packed = (b1.astype(jnp.int32).reshape(-1) * 256
              + b2.astype(jnp.int32).reshape(-1))
    pc, g = _pad_flat(packed, _SYNRGB_K, 0)
    lutr = lut_r.astype(jnp.float32).reshape(1, 256)
    lutg = lut_g.astype(jnp.float32).reshape(1, 256)
    lutb = lut_b.astype(jnp.float32).reshape(256, 256)
    out = pl.pallas_call(
        _synrgb_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((_SYNRGB_K, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SYNRGB_K, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g * _SYNRGB_K, 3), jnp.float32),
    )(pc, lutr, lutg, lutb)
    return out[:n].astype(jnp.uint8)


@jax.jit
def _synrgb_lookup_xla(b1, b2, lut_r, lut_g, lut_b):
    i1 = b1.astype(jnp.int32).reshape(-1)
    i2 = b2.astype(jnp.int32).reshape(-1)
    r = jnp.take(lut_r, i1)
    g = jnp.take(lut_g, i2)
    b = jnp.take(lut_b.reshape(-1), i1 * 256 + i2)
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)


def synrgb_lookup(b1, b2, lut_r, lut_g, lut_b):
    """(N,3) u8 from u8 bands + 256/256/65536 LUTs (flat N inputs)."""
    if not use_pallas():
        return _synrgb_lookup_xla(b1, b2, lut_r, lut_g, lut_b)
    f1 = b1.reshape(-1)
    f2 = b2.reshape(-1)
    n = f1.size
    if n <= _MAX_LOOKUP_ELEMS:
        return _synrgb_lookup_pallas(f1, f2, lut_r, lut_g, lut_b)
    parts = []
    for start in range(0, n, _MAX_LOOKUP_ELEMS):
        parts.append(_synrgb_lookup_pallas(
            f1[start:start + _MAX_LOOKUP_ELEMS], f2[start:start + _MAX_LOOKUP_ELEMS],
            lut_r, lut_g, lut_b,
        ))
    return jnp.concatenate(parts)
