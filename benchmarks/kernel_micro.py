#!/usr/bin/env python3
"""Micro-profile of the full-res pass internals (dev tool).

device_profile.py showed each streamed pass costing several times its
documented kernel-alone rate (e.g. flat histogram ~0.1 ms/4M vs a
0.63 ms/4M pass). This splits every pass into its elementwise front
(dB/mask/norm/bins) and its kernel, rep-differenced at 72 Mpx, to find
where the time actually goes. Prints a JSON dict of ms per part.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REPS = 6
OUTER = 3
SIDE = 8486  # 72 Mpx — cfg6's per-band size


def main():
    import jax
    import jax.numpy as jnp

    from sarpro_tpu.core import fused, streamed
    from sarpro_tpu.core.clahe import CLAHE_BINS, TILES_X, TILES_Y
    from sarpro_tpu.ops import clahe_lookup, histogram, tile_histogram
    from sarpro_tpu.types import AutoscaleStrategy
    from sarpro_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    @functools.partial(jax.jit, static_argnames=("side",))
    def _gen(k, mean, side):
        x = jnp.exp(mean + 1.1 * jax.random.normal(k, (side, side)))
        zeros = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.01,
                                     (side, side))
        return jnp.where(zeros, 0, jnp.clip(x, 0, 65535)).astype(jnp.uint16)

    def force(x):
        probe = x[tuple(slice(0, 8) for _ in range(min(x.ndim, 2)))]
        return int(np.asarray(jnp.max(probe.astype(jnp.int32))))

    def wall(fn):
        t0 = time.perf_counter()
        fn()
        return (time.perf_counter() - t0) * 1000.0

    def rep_diff(make, *args):
        def runner(r):
            @jax.jit
            def run(*a):
                acc = jnp.int32(0)
                for i in range(r):
                    out = make(jnp.int32(i), *a)
                    acc = acc + jnp.max(out.astype(jnp.int32))
                return acc

            run(*args)
            return lambda: int(np.asarray(run(*args)))

        one, many = runner(1), runner(REPS)
        t1 = min(wall(one) for _ in range(OUTER))
        tr = min(wall(many) for _ in range(OUTER))
        return max((tr - t1) / (REPS - 1), 0.0)

    dn = _gen(jax.random.PRNGKey(1), 5.0, SIDE)
    force(dn)
    rows = cols = SIDE
    n = rows
    count, mn, mx = streamed._scan_minmax(dn, n, 1, 0)
    s = streamed._scan_stats(dn, count, mn, mx, n, 1, 0)
    low, high, _g = fused._window(s, AutoscaleStrategy.CLAHE)
    tile_h = -(-rows // TILES_Y)
    tile_w = -(-cols // TILES_X)
    hists = streamed._scan_tile_hist(dn, low, high, n, 1, 0, cols, tile_h,
                                     tile_w)
    cdfs = streamed._cdfs_from_hists(hists, rows, cols, tile_h, tile_w)
    db0, mask0 = fused._db_mask(dn)
    norm0 = fused._clahe_norm(db0, mask0, low, high)
    bins_flat = fused._db_bin_index(db0, mask0, mn, mx)
    cb = fused._clahe_bins(norm0, mask0, rows, cols, tile_h, tile_w,
                           row_offset=jnp.int32(0))
    force(cb)
    t = {}

    def pert(i, x):
        return x + i.astype(x.dtype)

    t["db_mask"] = rep_diff(
        lambda i, d: fused._db_mask(pert(i, d))[0], dn)
    t["db_bin_index"] = rep_diff(
        lambda i, d: fused._db_bin_index(*fused._db_mask(pert(i, d)), mn,
                                         mx), dn)
    t["hist_kernel_on_bins"] = rep_diff(
        lambda i, b: histogram((b + i) % (4096 + 1), 4096), bins_flat)
    t["moments_only"] = rep_diff(
        lambda i, d: (lambda db, mask: (
            lambda dd: jnp.stack([jnp.sum(dd), jnp.sum(dd * dd)])
        )(jnp.where(mask, db - (mn + mx) * 0.5, 0.0)))(
            *fused._db_mask(pert(i, d))), dn)
    t["clahe_norm_chain"] = rep_diff(
        lambda i, d: (lambda db, mask: fused._clahe_norm(db, mask, low,
                                                         high))(
            *fused._db_mask(pert(i, d))), dn)
    t["clahe_bins_chain"] = rep_diff(
        lambda i, d: (lambda db, mask: fused._clahe_bins(
            fused._clahe_norm(db, mask, low, high), mask, rows, cols,
            tile_h, tile_w, row_offset=jnp.int32(0)))(
            *fused._db_mask(pert(i, d))), dn)
    t["tile_hist_kernel_on_bins"] = rep_diff(
        lambda i, b: tile_histogram(
            ((b + i) % (CLAHE_BINS * TILES_X * TILES_Y)).ravel(), cols,
            TILES_X, TILES_Y, tile_h, tile_w, row_offset=jnp.int32(0),
            n_bins=CLAHE_BINS), cb)
    t["clahe_lookup_kernel_on_bins"] = rep_diff(
        lambda i, b: clahe_lookup(
            ((b + i) % (CLAHE_BINS * TILES_X * TILES_Y)).ravel(), cdfs,
            cols, TILES_X, TILES_Y, tile_h, tile_w,
            row_offset=jnp.int32(0)), cb)

    for k, v in t.items():
        print(f"{k:32s} {v:8.2f} ms  ({v / (SIDE * SIDE / 4e6):.3f} ms/4M)",
              file=sys.stderr)
    print(json.dumps({k: round(v, 2) for k, v in t.items()}))


if __name__ == "__main__":
    main()
