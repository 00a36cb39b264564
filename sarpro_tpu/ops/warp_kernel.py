"""Pallas tiled warp sampler — the hot half of on-device reprojection.

XLA's generic gather costs ~45-85 ms per 4M-element tap group on v5e, making
a cubic warp ~1.4 s. This kernel exploits the warp's spatial coherence: the
inverse mapping is smooth, so each (16, 128) output tile reads from a small
source window. Per tile:

  1. DMA the (32, 256) source window from HBM into VMEM (window origins are
     scalar-prefetched, computed host-side from the coarse mapping grid);
  2. interpolate the mapping grid to per-pixel source coords (in-kernel,
     from the VMEM-resident grid — same math as the XLA path);
  3. sample separably via one-hot weight matrices (pixels along LANES — the
     row-stream layout of ops/kernels.py; (TPIX, 1) column outputs are
     lane-padded 128x in the tiled layout and were measured to dominate):
         Rᵀ  = window (WIN_R, WIN_C)ᵀ-contracted W_y (WIN_R, TPIX)   [MXU]
         out = Σ_r (W_x ⊙ Rᵀ)(WIN_C, TPIX)                           [VPU]
     with border renormalization via the separable weight sums — matching
     the XLA fallback's wsum semantics exactly.

Output leaves the kernel tile-major as (1, TPIX) lane-rows of a flat
(1, n_tiles·TPIX) array; the caller rearranges to row-major. Preconditions
(local scale ≤ ~1.7, window fits) are validated host-side; violations fall
back to the XLA sampler.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import interpret_mode

TR, TC = 16, 128          # output tile
TPIX = TR * TC
# Source window per tile. HBM DMA slices must start on (8, 128) tile
# boundaries, so origins are aligned down and the window absorbs the slack.
WIN_R, WIN_C = 48, 384

_TAPS = {"near": 1, "bilinear": 2, "cubic": 4}


def _keys_w(t):
    a = -0.5
    at = jnp.abs(t)
    at2 = at * at
    at3 = at2 * at
    w1 = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    w2 = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a
    return jnp.where(at < 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def _tap_weights(frac, method: str, n_taps: int):
    """Per-tap weights for offsets dy in [base .. base+n_taps)."""
    if method == "near":
        return [jnp.ones_like(frac)], 0
    if method == "bilinear":
        return [1.0 - frac, frac], 0
    # cubic: taps at -1, 0, 1, 2 relative to floor
    return [_keys_w(frac + 1.0), _keys_w(frac), _keys_w(frac - 1.0),
            _keys_w(frac - 2.0)], -1


def _warp_tile_kernel(method: str, src_h: int, src_w: int, ntx: int,
                      # per-tile SMEM scalar blocks
                      oy_ref, ox_ref, cx_ref, cy_ref,
                      # tensor inputs
                      src_hbm,
                      # output
                      out_ref,
                      # scratch
                      win_ref, sem):
    t = pl.program_id(0)
    s = t % 8  # row within the 8-tile SMEM scalar block
    # origins are host-aligned to the (8,128) HBM tiling; tell the compiler
    oy = pl.multiple_of(oy_ref[s, 0], 8)
    ox = pl.multiple_of(ox_ref[s, 0], 128)

    dma = pltpu.make_async_copy(
        src_hbm.at[pl.ds(oy, WIN_R), pl.ds(ox, WIN_C)], win_ref, sem
    )
    dma.start()

    # per-pixel output coords for this tile (pixels along lanes)
    ty = t // ntx
    tx = t % ntx
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, TPIX), 1)
    rf = (ty * TR + flat // TC).astype(jnp.float32)
    cf = (tx * TC + flat % TC).astype(jnp.float32)

    # per-tile bilinear mapping: s = A + B*c + C*r + D*r*c (host-fitted at the
    # tile corners from the true mapping, f64 -> f32 coefficients)
    sx = (cx_ref[s, 0] + cx_ref[s, 1] * cf + cx_ref[s, 2] * rf
          + cx_ref[s, 3] * rf * cf)
    sy = (cy_ref[s, 0] + cy_ref[s, 1] * cf + cy_ref[s, 2] * rf
          + cy_ref[s, 3] * rf * cf)

    n_taps = _TAPS[method]
    if method == "near":
        y0 = jnp.floor(sy + 0.5).astype(jnp.int32)
        x0 = jnp.floor(sx + 0.5).astype(jnp.int32)
        wys, base = [jnp.ones_like(sy)], 0
        wxs = [jnp.ones_like(sx)]
    else:
        y0f = jnp.floor(sy)
        x0f = jnp.floor(sx)
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        wys, base = _tap_weights(sy - y0f, method, n_taps)
        wxs, _ = _tap_weights(sx - x0f, method, n_taps)

    win_rows = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, TPIX), 0)
    win_cols = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, TPIX), 0)

    w_y = jnp.zeros((WIN_R, TPIX), jnp.float32)
    for i, wy in enumerate(wys):
        gy = y0 + (base + i)                      # global source row
        valid = (gy >= 0) & (gy < src_h)
        w = jnp.where(valid, wy, 0.0)
        w_y = w_y + (win_rows == (gy - oy)).astype(jnp.float32) * w
    w_x = jnp.zeros((WIN_C, TPIX), jnp.float32)
    for i, wx in enumerate(wxs):
        gx = x0 + (base + i)
        valid = (gx >= 0) & (gx < src_w)
        w = jnp.where(valid, wx, 0.0)
        w_x = w_x + (win_cols == (gx - ox)).astype(jnp.float32) * w

    dma.wait()
    rows = jax.lax.dot_general(  # (WIN_C, TPIX)
        win_ref[:], w_y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    val = jnp.sum(w_x * rows, axis=0, keepdims=True)
    wsum = (jnp.sum(w_y, axis=0, keepdims=True)
            * jnp.sum(w_x, axis=0, keepdims=True))
    out_ref[:] = jnp.where(wsum > 1e-6, val / jnp.maximum(wsum, 1e-20), 0.0)


def tiled_flat_call(src, oy, ox, cx, cy, method: str, n_tiles: int,
                    ntx: int, src_h: int, src_w: int):
    """The pallas_call itself, traced: n_tiles output tiles as a flat
    (1, n_tiles·TPIX) array. Shared by the whole-output jit below and the
    per-shard body of the row-sharded warp (parallel/warp.py)."""
    kern = functools.partial(_warp_tile_kernel, method, src_h, src_w, ntx)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            # per-tile scalars stream through SMEM, 8 tiles per block (the
            # minimum sublane granularity); the kernel reads row t % 8
            pl.BlockSpec((8, 1), lambda t: (t // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda t: (t // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 4), lambda t: (t // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 4), lambda t: (t // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # src stays in HBM
        ],
        out_specs=pl.BlockSpec((1, TPIX), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN_R, WIN_C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * TPIX), jnp.float32),
        interpret=interpret_mode(),
    )(oy, ox, cx, cy, src)


@functools.partial(
    jax.jit,
    static_argnames=("out_rows", "out_cols", "method", "nty", "ntx",
                     "src_h", "src_w"),
)
def _warp_tiled_call(src, oy, ox, cx, cy,
                     out_rows: int, out_cols: int, method: str,
                     nty: int, ntx: int, src_h: int, src_w: int):
    out_flat = tiled_flat_call(src, oy, ox, cx, cy, method, nty * ntx, ntx,
                               src_h, src_w)
    tiles = out_flat.reshape(nty, ntx, TR, TC)
    full = tiles.transpose(0, 2, 1, 3).reshape(nty * TR, ntx * TC)
    return full[:out_rows, :out_cols]


def plan_tiled_warp(map_x: np.ndarray, map_y: np.ndarray, src_h: int,
                    src_w: int, out_rows: int, out_cols: int,
                    method: str, plan_rows: int | None = None):
    """Host planning: per-tile window origins from the coarse mapping grid.

    Returns (oy, ox, nty, ntx) int32 arrays, or None when any tile's source
    footprint exceeds the fixed window (fall back to the XLA sampler).

    `plan_rows` lays tiles over MORE rows than the true output (the
    row-sharded warp pads the grid so every shard gets an equal tile-row
    block); mapping normalization stays in true-output coordinates. The
    corner lattice clamps to `out_rows - 1`, so padded tiles get
    constant-in-r coefficient fits that REPLICATE row `out_rows - 1`'s
    mapping — they sample real source data, and the caller MUST trim the
    output back to `out_rows` (both callers do)."""
    if method not in _TAPS:
        return None
    if src_h < WIN_R or src_w < WIN_C:
        return None
    nty = -(-(plan_rows if plan_rows is not None else out_rows) // TR)
    ntx = -(-out_cols // TC)
    gh, gw = map_x.shape

    # evaluate the mapping at tile corner lattice (host, vectorized)
    ry = np.minimum(np.arange(nty + 1) * TR, max(out_rows - 1, 1))
    cx = np.minimum(np.arange(ntx + 1) * TC, max(out_cols - 1, 1))
    gr = ry * ((gh - 1) / max(out_rows - 1, 1))
    gc = cx * ((gw - 1) / max(out_cols - 1, 1))

    def interp(grid):
        r0 = np.clip(np.floor(gr).astype(int), 0, gh - 2)
        c0 = np.clip(np.floor(gc).astype(int), 0, gw - 2)
        fr = (gr - r0)[:, None]
        fc = (gc - c0)[None, :]
        g00 = grid[np.ix_(r0, c0)]
        g01 = grid[np.ix_(r0, c0 + 1)]
        g10 = grid[np.ix_(r0 + 1, c0)]
        g11 = grid[np.ix_(r0 + 1, c0 + 1)]
        return (g00 * (1 - fr) * (1 - fc) + g01 * (1 - fr) * fc
                + g10 * fr * (1 - fc) + g11 * fr * fc)

    sx = interp(map_x)
    sy = interp(map_y)
    margin = 3  # cubic: -1..+2 around floor, plus grid-interp curvature slack

    def window(vals, align, win, src_len, src_pad):
        lo = np.minimum.reduce([vals[:-1, :-1], vals[:-1, 1:],
                                vals[1:, :-1], vals[1:, 1:]])
        hi = np.maximum.reduce([vals[:-1, :-1], vals[:-1, 1:],
                                vals[1:, :-1], vals[1:, 1:]])
        start = np.floor(lo).astype(np.int64) - margin
        # DMA origins must be (8,128)-tile aligned; the caller pads the
        # source to tile multiples so aligned windows can cover the edges
        start = np.clip((start // align) * align, 0, src_pad - win)
        end = np.ceil(hi).astype(np.int64) + margin
        if ((np.minimum(end, src_len) - start) > win).any():
            return None
        return start.astype(np.int32)

    src_h_pad = -(-src_h // 8) * 8
    src_w_pad = -(-src_w // 128) * 128
    if src_h_pad < WIN_R or src_w_pad < WIN_C:
        return None
    oy = window(sy, 8, WIN_R, src_h, src_h_pad)
    ox = window(sx, 128, WIN_C, src_w, src_w_pad)
    if oy is None or ox is None:
        return None

    # per-tile bilinear coefficients s = A + B·c + C·r + D·r·c in GLOBAL
    # output coords, fitted at the tile corners (f64, cast to f32)
    def coeffs(vals):
        ry0 = ry[:-1][:, None].astype(np.float64)
        cx0 = cx[:-1][None, :].astype(np.float64)
        sr = np.maximum(np.diff(ry), 1.0)[:, None]
        sc = np.maximum(np.diff(cx), 1.0)[None, :]
        v00 = vals[:-1, :-1]
        v01 = vals[:-1, 1:]
        v10 = vals[1:, :-1]
        v11 = vals[1:, 1:]
        p = v01 - v00
        q = v10 - v00
        r2 = v11 - v10 - v01 + v00
        d = r2 / (sr * sc)
        b = p / sc - d * ry0
        c = q / sr - d * cx0
        a = v00 - p * cx0 / sc - q * ry0 / sr + d * ry0 * cx0
        return np.stack(
            [a.reshape(-1), b.reshape(-1), c.reshape(-1), d.reshape(-1)],
            axis=1,
        ).astype(np.float32)

    return (oy.reshape(-1), ox.reshape(-1), coeffs(sx), coeffs(sy), nty, ntx)


def warp_sample_tiled(src, map_x: np.ndarray, map_y: np.ndarray,
                      out_rows: int, out_cols: int, method: str):
    """Tiled Pallas warp; returns None if preconditions fail (caller falls
    back to the XLA sampler). map_x/map_y are host numpy grids."""
    src_h, src_w = src.shape
    plan = plan_tiled_warp(np.asarray(map_x, np.float64),
                           np.asarray(map_y, np.float64),
                           src_h, src_w, out_rows, out_cols, method)
    if plan is None:
        return None
    oy, ox, cxc, cyc, nty, ntx = plan
    # pad to (8,128) multiples so aligned DMA windows can reach the edges;
    # validity masking in the kernel uses the TRUE dims
    pad_r = -(-src_h // 8) * 8 - src_h
    pad_c = -(-src_w // 128) * 128 - src_w
    src_p = jnp.pad(jnp.asarray(src, jnp.float32), ((0, pad_r), (0, pad_c)))
    # pad the per-tile scalar tables to a multiple of 8 rows (SMEM blocking)
    n = oy.size
    n_pad = -(-n // 8) * 8

    def padr(a, width):
        out = np.zeros((n_pad, width), a.dtype)
        out[:n] = a.reshape(n, width)
        return out

    return _warp_tiled_call(
        src_p, jnp.asarray(padr(oy, 1)), jnp.asarray(padr(ox, 1)),
        jnp.asarray(padr(cxc, 4)), jnp.asarray(padr(cyc, 4)),
        out_rows, out_cols, method, nty, ntx, src_h, src_w,
    )
