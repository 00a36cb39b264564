"""On-TPU kernel validation: every Pallas kernel against its XLA oracle.

The pytest suite pins JAX to the virtual CPU mesh (tests/conftest.py), so
the Pallas kernels' TPU lowerings are exercised here instead — run this on
the real chip (no JAX_PLATFORMS override) after kernel changes:

    python benchmarks/tpu_validate.py

Checks (PASS/FAIL per line, nonzero exit on any FAIL):
  histogram    — bit-exact counts vs bincount, incl. masked overflow bins
  clahe        — bilinear CDF lookup vs XLA within the hi/lo bf16 split
                 bound (~2e-5), incl. the row_offset shard path
  synrgb       — bit-exact LUT composition vs XLA takes
  synrgb_formula — ln-table+exp blue formula vs the table oracle, exhaustive
                 256x256 domain for default + all suppressed floors, plus
                 the fused in-graph stacked-table selection path
  resample     — banded-DMA kernel vs the tap-loop (box + lanczos, incl.
                 column-split heavy reductions) within f32 matmul bounds
  warp         — tiled sampler vs the XLA gather sampler (near/bilinear/
                 cubic; near/bilinear allow half-pixel tie flips)
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

FAILURES: list[str] = []
RESULTS: list[dict] = []


def check(name: str, ok: bool, detail: str = ""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    RESULTS.append({"name": name, "ok": ok, "detail": detail})
    if not ok:
        FAILURES.append(name)


def write_results(device: str):
    """Persist the per-round validation artifact (VERDICT r2 item 5)."""
    import json
    import pathlib

    out = pathlib.Path(__file__).parent / "tpu_validate_results.json"
    out.write_text(json.dumps({
        "device": device,
        "passed": len(RESULTS) - len(FAILURES),
        "failed": len(FAILURES),
        "checks": RESULTS,
    }, indent=2))
    print(f"wrote {out}")


def main():
    import jax
    import jax.numpy as jnp

    from sarpro_tpu.ops import kernels as K

    if not K.use_pallas():
        print(f"not on TPU (backend={jax.default_backend()}); nothing to do")
        return 0
    rng = np.random.default_rng(7)

    for n in (12288, 4 << 20):
        idx_np = rng.integers(0, 4300, n).astype(np.int32)
        got = np.asarray(K.histogram(jnp.asarray(idx_np), 4096))
        want = np.bincount(idx_np[idx_np < 4096], minlength=4096)
        check(f"histogram n={n}", np.array_equal(got, want))

        cdfs = jnp.asarray(rng.random((64, 256), np.float32))
        bins = jnp.asarray(rng.integers(0, 257, n).astype(np.int32))
        for off in (None, 512):
            got = np.asarray(K.clahe_lookup(bins, cdfs, 2048, 8, 8, 256,
                                            256, row_offset=off))
            want = np.asarray(K._clahe_lookup_xla(bins, cdfs, 2048, 8, 8,
                                                  256, 256, row_offset=off))
            err = float(np.abs(got - want).max())
            check(f"clahe n={n} off={off}", err < 2e-5, f"maxerr={err:.2e}")

        # tile histograms: banded (wide cols), full-fallback (narrow tile_h),
        # row_offset shard path, and odd row counts (partial bottom tile)
        for cols, rows_g, off in ((2048, n // 2048, None),
                                  (2048, 999, 512),
                                  (512, 128, None)):
            tile_h = -(-rows_g // 8)
            tile_w = -(-cols // 8)
            m = rows_g * cols if rows_g * cols <= n else n
            bt = jnp.asarray(rng.integers(0, 257, m).astype(np.int32))
            got = np.asarray(K.tile_histogram(bt, cols, 8, 8, tile_h, tile_w,
                                              row_offset=off))
            want = np.asarray(K._tile_histogram_xla(bt, cols, 8, 8, tile_h,
                                                    tile_w, 256,
                                                    row_offset=off))
            check(f"tile_histogram n={m} cols={cols} off={off}",
                  np.array_equal(got, want))

        b1 = jnp.asarray(rng.integers(0, 256, n).astype(np.uint8))
        b2 = jnp.asarray(rng.integers(0, 256, n).astype(np.uint8))
        lr, lg = (jnp.asarray(rng.integers(0, 256, 256).astype(np.uint8))
                  for _ in range(2))
        lb = jnp.asarray(
            rng.integers(0, 256, 65536).astype(np.uint8).reshape(256, 256))
        got = np.asarray(K.synrgb_lookup(b1, b2, lr, lg, lb))
        want = np.asarray(K._synrgb_lookup_xla(b1, b2, lr, lg, lb))
        check(f"synrgb n={n}", np.array_equal(got, want))

    # formulaic synRGB: exhaustive 256x256 domain, default + every
    # reachable suppressed floor, vs the XLA table oracle (bit-exact)
    from sarpro_tpu.core import synthetic_rgb as S

    b1d, b2d = np.meshgrid(np.arange(256, dtype=np.uint8),
                           np.arange(256, dtype=np.uint8), indexing="ij")
    fb1, fb2 = jnp.asarray(b1d.ravel()), jnp.asarray(b2d.ravel())
    lut_r, lut_g, lut_b = S.default_luts()
    want = np.asarray(K._synrgb_lookup_xla(
        fb1, fb2, jnp.asarray(lut_r), jnp.asarray(lut_g),
        jnp.asarray(lut_b.reshape(256, 256))))
    got = np.asarray(K.synrgb_lookup_formula(
        fb1, fb2, *S.default_formula_tables(), guard_b2=True))
    check("synrgb_formula default full-domain", np.array_equal(got, want))
    nbad = 0
    for fc in range(3, 41):
        slr, slg, slb = S.suppressed_luts(fc)
        want = np.asarray(K._synrgb_lookup_xla(
            fb1, fb2, jnp.asarray(slr), jnp.asarray(slg),
            jnp.asarray(slb.reshape(256, 256))))
        got = np.asarray(K.synrgb_lookup_formula(
            fb1, fb2, *S.suppressed_formula_tables(fc), guard_b2=False))
        nbad += int((got != want).any(axis=1).sum())
    check("synrgb_formula suppressed floors 3..40", nbad == 0,
          f"mismatched pairs={nbad}")

    # fused suppressed path: in-graph stacked-table selection vs an oracle
    # built from the host floor + XLA table lookup
    from sarpro_tpu.core import fused as F

    sb1 = jnp.asarray(rng.integers(0, 256, (512, 512)).astype(np.uint8))
    sb2 = jnp.asarray(rng.integers(0, 64, (512, 512)).astype(np.uint8))
    got = np.asarray(jax.jit(F._synrgb_suppressed)(sb1, sb2))
    hist = (np.bincount(np.asarray(sb1).ravel(), minlength=256)
            + np.bincount(np.asarray(sb2).ravel(), minlength=256))
    cum = np.cumsum(hist)
    fv = int(np.argmax(cum >= np.floor(sb1.size * 2 * 0.05 + 0.5)))
    fc = min(fv + 3, 40)
    olr, olg, olb = S.suppressed_luts(fc)
    rgb = np.asarray(K._synrgb_lookup_xla(
        sb1.ravel(), sb2.ravel(), jnp.asarray(olr), jnp.asarray(olg),
        jnp.asarray(olb.reshape(256, 256)))).reshape(512, 512, 3)
    water = ((np.asarray(sb1) <= fc) & (np.asarray(sb2) <= fc))[..., None]
    want = np.where(water, np.uint8(0), rgb)
    check("fused suppressed formula-path", np.array_equal(got, want))

    # resample: banded kernel vs tap loop
    from sarpro_tpu.core.resize import _build_coeffs, _resample_axis0
    from sarpro_tpu.ops.resample_kernel import band_resample_axis0

    side = 6000
    x = jnp.asarray(rng.integers(0, 60000, (side, side)).astype(np.uint16))
    for out_n, filt in ((2048, "average"), (512, "average"),
                        (1024, "lanczos")):
        got = band_resample_axis0(x, side, out_n, filt)
        if got is None:
            check(f"resample {filt} {side}->{out_n}", False, "kernel refused")
            continue
        s, w = _build_coeffs(side, out_n, filt)
        want = np.asarray(_resample_axis0(x, jnp.asarray(s), jnp.asarray(w)))
        rel = float((np.abs(np.asarray(got) - want)
                     / np.maximum(np.abs(want), 1.0)).max())
        check(f"resample {filt} {side}->{out_n}", rel < 1e-5,
              f"maxrel={rel:.2e}")

    # warp sampler vs XLA gather sampler
    from sarpro_tpu.io.warp import _warp_sample
    from sarpro_tpu.ops.warp_kernel import warp_sample_tiled

    src = jnp.asarray(rng.random((2560, 2560)).astype(np.float32) * 1000)
    out_r = out_c = 2048
    gh = gw = 65
    gy, gx = np.meshgrid(np.linspace(0, out_r - 1, gh),
                         np.linspace(0, out_c - 1, gw), indexing="ij")
    map_x = 0.021 * gy + 1.217 * gx + 5.3
    map_y = 1.191 * gy - 0.013 * gx + 8.7
    for method, tol_frac in (("near", 2e-3), ("bilinear", 2e-3),
                             ("cubic", 1e-6)):
        got = warp_sample_tiled(src, map_x, map_y, out_r, out_c, method)
        if got is None:
            check(f"warp {method}", False, "kernel refused")
            continue
        want = np.asarray(_warp_sample(
            src, jnp.asarray(map_x, jnp.float32),
            jnp.asarray(map_y, jnp.float32), out_r, out_c, method))
        diff = np.abs(np.asarray(got) - want)
        # near/bilinear: half-pixel coordinate ties may flip to a different
        # source pixel in a tiny fraction of pixels; cubic must agree
        frac_off = float((diff > 1.0).mean())
        check(f"warp {method}", frac_off < tol_frac,
              f"frac>|1.0|={frac_off:.2e}")

    # row-sharded tiled warp (parallel/warp.py): the per-shard table
    # construction + coefficient rebasing around the same kernel. One real
    # chip -> a 1-device row mesh (R0=0 rebase is the identity), so this
    # validates the sharded pallas_call plumbing on silicon; the multi-
    # shard table math is covered on the virtual CPU mesh
    # (tests/test_warp_sharded.py).
    from sarpro_tpu.parallel.warp import _try_tiled_sharded, make_row_mesh

    want = np.asarray(warp_sample_tiled(src, map_x, map_y, out_r, out_c,
                                        "cubic"))
    got = _try_tiled_sharded(src, map_x, map_y, out_r, out_c, "cubic",
                             make_row_mesh(1), 1)
    if got is None:
        check("warp sharded-tiled n=1", False, "plan refused")
    else:
        diff = np.abs(np.asarray(got) - want)
        frac_off = float((diff > 1.0).mean())
        check("warp sharded-tiled n=1", frac_off < 1e-6,
              f"frac>|1.0|={frac_off:.2e}")

    # JPEG front-end: device FDCT + q100 quantize vs f64 oracle (±1 for
    # f32 contraction rounding), incl. edge-replicated partial blocks
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
    from oracle import jpeg_dct_oracle

    pl = rng.integers(0, 256, (3, 2048, 2048)).astype(np.uint8)
    got = np.asarray(jax.jit(F.jpeg_dct_planes)(jnp.asarray(pl)))
    want = jpeg_dct_oracle(pl)
    dmax = int(np.abs(got.astype(int) - want.astype(int)).max())
    check("jpeg_dct 2048^2", dmax <= 1, f"maxdiff={dmax}")
    oddp = jnp.asarray(pl[:, :1021, :1019])
    got = np.asarray(jax.jit(F.jpeg_dct_planes)(oddp))
    check("jpeg_dct odd-size shape", got.shape == (3, 128, 128, 8, 8))
    # odd BLOCK count: the pair-of-blocks operator's pad block slice-off
    oddb = pl[:, :1024, :1016]
    got = np.asarray(jax.jit(F.jpeg_dct_planes)(jnp.asarray(oddb)))
    want = jpeg_dct_oracle(oddb)
    dmax = int(np.abs(got.astype(int) - want.astype(int)).max())
    check("jpeg_dct odd block count", got.shape == (3, 128, 127, 8, 8)
          and dmax <= 1, f"shape={got.shape} maxdiff={dmax}")

    # streamed q16 compose route vs the fused program, on silicon: the
    # bands stay in q16 staging with CLAHE bins staged by the tile-hist
    # pass and the u16->u8 scale folded into the compose (0.5.0) — byte
    # equality is the route's contract
    from sarpro_tpu.core import streamed as S
    from sarpro_tpu.types import AutoscaleStrategy

    dn1 = rng.integers(0, 65536, (1024, 896)).astype(np.uint16)
    dn2 = rng.integers(0, 65536, (1024, 896)).astype(np.uint16)
    dn1[rng.random((1024, 896)) < 0.02] = 0
    for strat in (AutoscaleStrategy.CLAHE, AutoscaleStrategy.TAMED):
        want = np.asarray(F.synrgb_pipeline(
            dn1, dn2, strategy=strat, target_size=None, pad=True))
        got = np.asarray(S.synrgb_streamed(
            dn1, dn2, strategy=strat, pad=True, chunk_rows=192))
        check(f"streamed q16 synrgb {strat.name} vs fused",
              np.array_equal(got, want))

    print(f"\n{len(FAILURES)} failure(s)")
    write_results(str(jax.devices()[0]))
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
