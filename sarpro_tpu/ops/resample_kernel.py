"""Banded-DMA separable resampler (axis 0) — one pass over the source.

The XLA tap-loop (core/resize._resample_axis0) sweeps the source once per
filter tap, materializing a full-width f32 intermediate per tap (measured
~5.5 ms for the 400 MP u16 row pass at 11 taps on v5e). This kernel makes a
single pass: per 8-output-row block it DMAs the covering source row band
HBM→VMEM (double-buffered) and applies an (8, B)·(B, cols) MXU matmul whose
weight block carries the filter coefficients in band-local coordinates —
the same coefficients `_build_coeffs` produces, so any separable filter
(box/lanczos/cubic/bilinear) fits.

Constraints mapped to the TPU tiling: band starts align down to 16 sublanes
(`pl.multiple_of`), the band height B is a 16-multiple, and the DMA'd column
extent is the largest 128-multiple ≤ cols — the ragged column tail (cols %
128) is resampled by the XLA tap-loop and written into the kernel output's
tail slice (cheap: ≤127 columns).

Used by the DN downsample and plane-resample paths (core/resize). The
quantized u8/u16 Pillow-exact resize keeps the tap-loop: its per-tap f32
sum order is part of the bit-exactness contract with the reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import interpret_mode, use_pallas

_MAX_SCRATCH_BYTES = 12 << 20  # 2 double-buffered bands must fit VMEM


@functools.lru_cache(maxsize=64)
def _band_plan(in_size: int, out_size: int, filter_name: str):
    """(r0s, W, B, G) band geometry + band-local weight blocks (numpy)."""
    from ..core.resize import _build_coeffs

    starts, weights = _build_coeffs(in_size, out_size, filter_name)
    out_n, ksize = weights.shape
    G = -(-out_n // 8)
    spans = []
    for i in range(G):
        o0 = i * 8
        o1 = min(o0 + 8, out_n) - 1
        spans.append(int(starts[o1]) + ksize - int(starts[o0]))
    # +16 slack: the band start rounds DOWN to the 16-sublane tiling (≤15
    # rows). There is deliberately NO end clamp — an aligned fixed-length
    # band cannot end exactly at an unaligned in_size, and clamping the
    # start down silently dropped tail-row taps (weight loss on the bottom
    # edge; caught by code review). Blocks whose band would poke past the
    # source are EXCLUDED via `kernel_blocks`; the caller computes those
    # output rows with the tap-loop instead.
    B = int(np.ceil((max(spans) + 16) / 16.0) * 16)
    if B > in_size:
        return None  # band would exceed the source extent everywhere
    r0s = np.zeros(G, np.int32)
    W = np.zeros((G, 8, B), np.float32)
    kernel_blocks = G
    for i in range(G):
        o0 = i * 8
        r0 = int(starts[o0]) // 16 * 16
        if r0 + B > in_size:
            kernel_blocks = min(kernel_blocks, i)
        r0s[i] = r0
        for j in range(8):
            o = o0 + j
            if o >= out_n:
                break
            off = int(starts[o]) - r0
            w = weights[o]
            for t in range(ksize):
                if w[t] != 0.0:
                    if not 0 <= off + t < B:
                        # a tap escapes the band: refuse the kernel rather
                        # than drop filter weight (tap-loop handles it)
                        return None
                    W[i, j, off + t] = w[t]
    if kernel_blocks == 0:
        return None
    return r0s, W, B, G, kernel_blocks


def _kernel(B: int, G: int, col0: int, needs_cast: bool, r0s_ref, w_ref,
            x_ref, out_ref, scratch, sems):
    i = pl.program_id(0)

    def dma(slot, block):
        r0 = pl.multiple_of(r0s_ref[block, 0], 16)
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(r0, B), pl.ds(col0, scratch.shape[2])],
            scratch.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < G)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    band = scratch[i % 2]
    if needs_cast:
        # u16 -> f32 is unsupported in Mosaic; route through i32
        band = band.astype(jnp.int32)
    band = band.astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        w_ref[0], band, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # true-f32 passes: the default bf16 matmul costs ~5e-3 relative
        # error on u16-range data; the band matmul is tiny (3.6 GMACs for
        # a 400 MP pass), so the 6-pass f32 mode is free
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit,
                   static_argnames=("out_n", "ca", "B", "G", "col0"))
def _banded_call(x, r0s, W, out_n: int, ca: int, B: int, G: int,
                 col0: int = 0):
    out = pl.pallas_call(
        functools.partial(_kernel, B, G, col0, x.dtype != jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((G, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # source stays in HBM
        ],
        out_specs=pl.BlockSpec((8, ca), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * 8, ca), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, B, ca), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret_mode(),
    )(r0s.reshape(G, 1), W, x)
    return out[:out_n]


def band_resample_axis0(x, in_size: int, out_size: int, filter_name: str):
    """Axis-0 resample of a 2D u16/f32 array to out_size rows, or None when
    the kernel's preconditions don't hold (caller falls back to the
    tap-loop). Numerics: same coefficients; per-output-element sums run on
    the MXU instead of tap order (f32-level differences only)."""
    if not use_pallas():
        return None
    if x.ndim != 2 or x.dtype not in (jnp.uint16, jnp.float32):
        return None
    rows, cols = x.shape
    if rows != in_size or out_size < 8 or in_size <= out_size:
        return None
    ca = cols // 128 * 128
    if ca == 0:
        return None
    plan = _band_plan(in_size, out_size, filter_name)
    if plan is None:
        return None
    r0s, W, B, G, kb = plan
    kb_rows = min(kb * 8, out_size)
    # heavy reductions (large B) exceed the double-buffered VMEM budget at
    # full width: split the column range into 128-aligned chunks, each its
    # own pallas_call DMA-ing (B, chunk) sub-windows of the same HBM source
    n_split = -(-2 * B * ca * x.dtype.itemsize // _MAX_SCRATCH_BYTES)
    if n_split > 8:
        return None  # absurd band; let the tap-loop handle it
    r0s_j, W_j = jnp.asarray(r0s[:kb]), jnp.asarray(W[:kb])
    chunk = max(-(-ca // n_split) // 128 * 128, 128)
    if 2 * B * chunk * x.dtype.itemsize > _MAX_SCRATCH_BYTES:
        # the column split cannot shrink below 128 lanes: a narrow raster
        # with an extreme reduction (band height B huge) would blow the
        # double-buffered scratch at compile time — tap-loop instead
        return None
    parts = []
    col0 = 0
    while col0 < ca:
        c = min(chunk, ca - col0)
        parts.append(_banded_call(x, r0s_j, W_j, kb_rows, c, B, kb,
                                  col0=col0))
        col0 += c
    main = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    from ..core.resize import _build_coeffs, _resample_axis0

    s, w = _build_coeffs(in_size, out_size, filter_name)
    if ca != cols:
        tail = _resample_axis0(x[:, ca:], jnp.asarray(s),
                               jnp.asarray(w))[:kb_rows]
        main = jnp.concatenate([main, tail], axis=1)
    if kb_rows < out_size:
        # blocks whose DMA band would poke past the (unaligned) source end:
        # their few output rows come from the tap-loop (gathers clamp fine)
        rows_tail = _resample_axis0(x, jnp.asarray(s[kb_rows:]),
                                    jnp.asarray(w[kb_rows:]))
        main = jnp.concatenate([main, rows_tail], axis=0)
    return main
